"""Fused strip_cache sweeps (models/streaming._factor_strip_fused):
use_pallas=True routes the coarse+one-polish sketch recipe through the
four-sweep Pallas path (strip_ext2 / sandwich+spost / sandwich / colstats)
and the padded Pallas strip emitter. Output must stay in the same
rounding class as the unfused XLA strip schedule — the two differ only
in reduction order on identical bf16 operands."""

import numpy as np
import pytest

import graphlap_tpu as gl
from graphlap_tpu.config import PipelineConfig
from graphlap_tpu.models.pipeline import filter_image, make_plan


@pytest.fixture(scope="module")
def img_noisy():
    img = gl.make_test_image(96, 96)
    noisy = np.clip(gl.add_gaussian_noise(img, 0.1, seed=1), 0, 1)
    return img, noisy.astype(np.float32)


def _base(**kw):
    cfg = dict(kernel="nlm", h=0.15, sample_rho=0.02, num_eigvecs=24,
               sinkhorn_iters=6, filter_name="identity", streaming=True,
               strip_cache=True, solver="sketch", sketch_oversample=206,
               sketch_power=0, sinkhorn_coarse=4, sinkhorn_polish=1,
               affinity_dtype="bfloat16_store")
    cfg.update(kw)
    return PipelineConfig(**cfg)


def test_fused_matches_unfused_bf16_store(img_noisy):
    img, noisy = img_noisy
    base = _base()
    plan = make_plan(noisy, base)
    unfused = filter_image(noisy, base, plan=plan)
    fused = filter_image(noisy, base.replace(use_pallas=True), plan=plan)
    # same estimator, same bf16-GEMM-input class, different reduction order
    np.testing.assert_allclose(fused.image, unfused.image, atol=2e-2)
    d = abs(gl.psnr(img, fused.image) - gl.psnr(img, unfused.image))
    assert d < 0.05, f"fused/unfused PSNR delta {d:.4f} dB"


def test_fused_matches_unfused_f32(img_noisy):
    """f32 strip: both schedules run HIGHEST-precision dots on identical
    f32 tiles — the gap is pure reduction order, so the bound tightens."""
    img, noisy = img_noisy
    base = _base(affinity_dtype="float32")
    plan = make_plan(noisy, base)
    unfused = filter_image(noisy, base, plan=plan)
    fused = filter_image(noisy, base.replace(use_pallas=True), plan=plan)
    np.testing.assert_allclose(fused.image, unfused.image, atol=2e-3)
    d = abs(gl.psnr(img, fused.image) - gl.psnr(img, unfused.image))
    assert d < 0.02


def test_gate_routes_only_the_fused_recipe(img_noisy):
    """Recipes outside the fused gate (polish != 1 here) must fall through
    to the unfused schedule and still run with use_pallas=True."""
    from graphlap_tpu.models.streaming import _strip_ctx, _strip_fused_ok

    _, noisy = img_noisy
    on = _base(use_pallas=True)
    off = on.replace(sinkhorn_polish=2)
    plan = make_plan(noisy, on)
    import jax.numpy as jnp
    idx_a = jnp.asarray(plan.idx_a)
    img_j = jnp.asarray(noisy)
    assert _strip_fused_ok(_strip_ctx(img_j, idx_a, on), on)
    assert not _strip_fused_ok(_strip_ctx(img_j, idx_a, off), off)
    res = filter_image(noisy, off, plan=plan)       # runs, unfused
    assert np.isfinite(res.image).all()


def test_padded_strip_rows_are_exact_zero(img_noisy):
    """The poisoned padding feature rows must emit exact-zero strip rows —
    the fused kernels' correctness contract (zero rows vanish from every
    dot)."""
    import jax.numpy as jnp

    from graphlap_tpu.models.streaming import _strip_ctx

    _, noisy = img_noisy
    cfg = _base(use_pallas=True)
    plan = make_plan(noisy, cfg)
    ctx = _strip_ctx(jnp.asarray(noisy), jnp.asarray(plan.idx_a), cfg)
    assert ctx.strip_pad is not None
    pad_rows = np.asarray(ctx.strip_pad[ctx.p:])
    assert pad_rows.shape[0] > 0
    assert (pad_rows == 0).all()
