"""Out-of-core tiled filtering (models/tiled.py)."""

import numpy as np
import pytest

from graphlap_tpu import (add_gaussian_noise, filter_image,
                          filter_image_tiled, make_test_image, psnr)
from graphlap_tpu.config import PipelineConfig

CFG = PipelineConfig(kernel="gaussian", h=0.2, spatial_h=8.0,
                     sample_rho=0.03, num_eigvecs=16, sinkhorn_iters=8)


def _noisy(side=160, seed=5, channels=0):
    clean = make_test_image(side, side, channels=channels)
    noisy = np.clip(add_gaussian_noise(clean, 0.1, seed=seed), 0, 1)
    return clean.astype(np.float32), noisy.astype(np.float32)


def test_tiled_partition_of_unity(monkeypatch):
    # blend isolation: with a passthrough "filter", the tiled output must
    # reproduce the input EXACTLY — the Hann weights are normalized to a
    # per-pixel partition of unity, so any leak/seam shows immediately
    from graphlap_tpu.models import tiled as tl
    from graphlap_tpu.models.pipeline import FilterResult

    monkeypatch.setattr(
        tl, "filter_image",
        lambda img, cfg, plan=None, mesh=None: FilterResult(
            image=np.asarray(img, np.float32),
            eigvals=np.zeros((0,), np.float32), timings={}))
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, size=(150, 171)).astype(np.float32)
    out = tl.filter_image_tiled(img, CFG, tile=96, overlap=32)
    assert out.image.shape == img.shape
    np.testing.assert_allclose(out.image, img, atol=2e-6)


def test_tiled_quality_matches_full_image():
    """Per-tile graphs vs the one global graph: the denoising quality
    must stay in the same class (the affinity horizon is much smaller
    than a tile), and seams must not show as a PSNR hit."""
    clean, noisy = _noisy(160)
    full = filter_image(noisy, CFG)
    tiled = filter_image_tiled(noisy, CFG, tile=96, overlap=32)
    p_full = psnr(clean, full.image)
    p_tiled = psnr(clean, tiled.image)
    assert p_tiled > psnr(clean, noisy) + 2.0       # really denoises
    # per-tile graphs must not LOSE to the one global graph (at fixed m
    # they actually WIN here: 4 tile-bases = 4x the effective rank —
    # measured +4.1 dB at this shape); seams would show as a loss
    assert p_tiled >= p_full - 0.3
    # one eigval row per tile (2x2 grid at 160/96/overlap 32)
    assert tiled.eigvals.shape[0] == 4


def test_tiled_color_and_small_passthrough():
    clean, noisy = _noisy(112, channels=3)
    out = filter_image_tiled(noisy, CFG, tile=96, overlap=32)
    assert out.image.shape == noisy.shape
    assert psnr(clean, out.image) > psnr(clean, noisy) + 1.5
    # image smaller than one tile: exact filter_image passthrough
    ref = filter_image(noisy[:64, :64], CFG)
    same = filter_image_tiled(noisy[:64, :64], CFG, tile=96, overlap=32)
    np.testing.assert_allclose(same.image, ref.image, atol=1e-6)


def test_tiled_streaming_and_validation():
    clean, noisy = _noisy(160)
    scfg = CFG.replace(streaming=True, block_cols=1024)
    out = filter_image_tiled(noisy, scfg, tile=96, overlap=32)
    assert psnr(clean, out.image) > psnr(clean, noisy) + 2.0
    with pytest.raises(ValueError, match="overlap"):
        filter_image_tiled(noisy, CFG, tile=96, overlap=96)


def test_cli_tile_flag(tmp_path, capsys):
    from graphlap_tpu import save_image
    from graphlap_tpu.cli import main as cli_main
    path = str(tmp_path / "in.png")
    save_image(path, make_test_image(112, 112))
    rc = cli_main(["-f", path, "-o", str(tmp_path / "out.png"),
                   "-grayscale", "-cpu", "-noise", "0.1",
                   "-tile", "96", "-tile_overlap", "32", "-log_view"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "tiled_total" in out and "PSNR" in out


def test_tiled_with_mesh_matches_unsharded():
    # -tile composes with the mesh route: each tile runs rows-sharded
    from graphlap_tpu.parallel.mesh import make_mesh
    clean, noisy = _noisy(160)
    scfg = CFG.replace(streaming=True, block_cols=1024)
    ref = filter_image_tiled(noisy, scfg, tile=96, overlap=32)
    got = filter_image_tiled(noisy, scfg, tile=96, overlap=32,
                             mesh=make_mesh(8, 1))
    np.testing.assert_allclose(got.image, ref.image, atol=3e-4)
