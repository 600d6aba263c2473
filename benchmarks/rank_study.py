"""Quality-vs-rank study at capacity scale (VERDICT r3 next-round #1).

The capacity rows (8-64 MP) denoise to only +2.9 dB vs +6.5 dB at 512^2,
and the tiled mode's +4.1 dB at fixed m says effective rank may bind
(SURVEY.md §1.3). Three candidate limiters, each swept here on the real
8 MP benchmark shape (and a 32 MP subset):

  1. BANDWIDTH: the capacity rows inherited h=0.25 while the round-3
     quality calibration measured h = 1.5 sigma = 0.15 optimal for NLM at
     512^2 (quality_sweep.jsonl) — never re-validated at 8 MP.
  2. RANK (p, m): a rank-m spectral reconstruction of an 8 MP image has
     16x fewer basis columns per pixel than at 512^2. Swept
     p in {2048, 4096, 8192, 16384 (cap LIFTED)} x m in {50, 100, 200}.
  3. TRUNCATION ITSELF: filter_mode="matvec" applies z = W y EXACTLY
     (full rank, no eigensolve at all) — if the gap is the projection,
     this recovers it at LOWER cost than the spectral path.

Also runs the tiled per-tile-basis recipe at 8 MP (the +4.1 dB hint) as
a quality topline, and the best-found recipe at 32 MP.

All rows: streaming 'fast'-preset class recipes (gate-compliant
decimations), PSNR vs the clean image, device wall via scalar-readback
sync. Appends to benchmarks/results/rank_study.jsonl.

Usage: python benchmarks/rank_study.py [grid|h|matvec|tiled|32mp|all]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

from graphlap_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache(Path(__file__).parent.parent)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np

RESULTS = Path(__file__).parent / "results" / "rank_study.jsonl"


def _workload(h, w, sigma=0.1, seed=1):
    import graphlap_tpu as gl
    img = gl.make_test_image(h, w)
    noisy = np.clip(gl.add_gaussian_noise(img, sigma, seed=seed), 0, 1)
    return img, noisy


def _base(p_cap: int, m: int, h_band: float, n: int):
    """Streaming fast-preset recipe at (p, m, h) for an n-pixel image."""
    import graphlap_tpu as gl
    base = gl.PipelineConfig(
        kernel="nlm", h=h_band, sample_rho=0.01, sample_cap=p_cap,
        num_eigvecs=m, filter_name="identity", streaming=True,
        block_cols=131072)
    return gl.tuned_config(base, n, "fast")


def _run(tag, cfg, img, noisy, extra=None):
    import graphlap_tpu as gl
    from graphlap_tpu.models.pipeline import make_plan

    plan = make_plan(noisy, cfg)
    t0 = time.perf_counter()
    gl.filter_image(noisy, cfg, plan=plan)            # compile + warm
    compile_s = time.perf_counter() - t0
    walls = []
    for _ in range(2):
        t0 = time.perf_counter()
        res = gl.filter_image(noisy, cfg, plan=plan)
        walls.append(time.perf_counter() - t0)
    rec = {
        "tag": tag, "shape": list(noisy.shape), "p": plan.p,
        "m": cfg.num_eigvecs, "h": cfg.h,
        "filter_mode": cfg.filter_mode, "filter": cfg.filter_name,
        "filter_param": cfg.filter_param,
        "config_hash": cfg.config_hash(),
        "recipe": {"sc": cfg.sinkhorn_coarse, "it": cfg.sinkhorn_iters,
                   "pol": cfg.sinkhorn_polish, "gc": cfg.gram_coarse,
                   "fused": cfg.fused_finish, "dtype": cfg.affinity_dtype},
        "wall_s": round(min(walls), 3), "compile_s": round(compile_s, 1),
        "psnr_in_db": round(float(__import__("graphlap_tpu").psnr(img, noisy)), 3),
        "psnr_out_db": round(float(__import__("graphlap_tpu").psnr(img, res.image)), 4),
        "ts": time.time(),
    }
    if extra:
        rec.update(extra)
    RESULTS.parent.mkdir(parents=True, exist_ok=True)
    with RESULTS.open("a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    return rec


def sweep_grid(img, noisy):
    """PSNR vs (p, m) at the calibrated h=0.15."""
    n = noisy.size
    for p_cap in (2048, 4096, 8192, 16384):
        for m in (50, 100, 200):
            cfg = _base(p_cap, m, 0.15, n)
            _run(f"grid_p{p_cap}_m{m}", cfg, img, noisy)


def sweep_h(img, noisy):
    """Bandwidth calibration at 8 MP (p=4096, m=50 spectral identity)."""
    n = noisy.size
    for h_band in (0.10, 0.15, 0.20, 0.25):
        cfg = _base(4096, 50, h_band, n)
        _run(f"h{h_band:g}_p4096_m50", cfg, img, noisy)


def sweep_matvec(img, noisy):
    """Exact full-rank application z = f(W) y — no eigensolve, no rank
    truncation. identity (one W apply) and power-2 (two) at the swept h."""
    n = noisy.size
    for h_band in (0.10, 0.15, 0.25):
        for fname, fparam in (("identity", 1.0), ("power", 2.0)):
            cfg = _base(4096, 50, h_band, n).replace(
                filter_mode="matvec", filter_name=fname, filter_param=fparam,
                fused_finish=False)
            _run(f"mv_{fname}{fparam:g}_h{h_band:g}", cfg, img, noisy)


def sweep_tiled(img, noisy):
    """Per-tile bases at 8 MP: 1024^2 tiles, each its own rank-m basis —
    effective rank ~ m x n_tiles (the +4.1 dB mechanism at 160^2)."""
    import graphlap_tpu as gl
    for tile, m in ((1024, 50), (2048, 50)):
        cfg = _base(4096, m, 0.15, tile * tile).replace(block_cols=65536)
        t0 = time.perf_counter()
        res = gl.filter_image_tiled(noisy, cfg, tile=tile, overlap=128)
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = gl.filter_image_tiled(noisy, cfg, tile=tile, overlap=128)
        wall = time.perf_counter() - t0
        rec = {
            "tag": f"tiled{tile}_m{m}", "shape": list(noisy.shape),
            "p": cfg.num_samples(tile * tile), "m": m, "h": cfg.h,
            "tile": tile, "config_hash": cfg.config_hash(),
            "wall_s": round(wall, 3), "compile_s": round(warm, 1),
            "psnr_in_db": round(float(gl.psnr(img, noisy)), 3),
            "psnr_out_db": round(float(gl.psnr(img, res.image)), 4),
            "ts": time.time(),
        }
        RESULTS.parent.mkdir(parents=True, exist_ok=True)
        with RESULTS.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


def sweep_refine(img, noisy):
    """Pin the matvec-identity h optimum at 8 MP (the coarse sweep found
    h=0.1 > h=0.15 > h=0.25; refine below/around 0.1)."""
    n = noisy.size
    for h_band in (0.07, 0.085, 0.125):
        cfg = _base(4096, 50, h_band, n).replace(
            filter_mode="matvec", filter_name="identity",
            fused_finish=False)
        _run(f"mv_identity1_h{h_band:g}", cfg, img, noisy)


def sweep_crossover():
    """matvec vs tuned-spectral identity at 512^2 / 1024^2 / 2 MP: where
    does the full-rank operator overtake the rank-m reconstruction? Sets
    the preset routing boundary."""
    import graphlap_tpu as gl
    for side in (512, 1024, 1448):
        img, noisy = _workload(side, side)
        n = side * side
        spec = _base(8192, 50, 0.15, n)
        mv = spec.replace(filter_mode="matvec", filter_name="identity",
                          fused_finish=False, h=0.10)
        mv15 = mv.replace(h=0.15)
        for tag, cfg in ((f"x{side}_spectral_h.15", spec),
                         (f"x{side}_mv_h.10", mv),
                         (f"x{side}_mv_h.15", mv15)):
            _run(tag, cfg, img, noisy)


def sweep_32mp():
    """Confirm the winners at 32 MP (4096x8192)."""
    img, noisy = _workload(4096, 8192)
    n = noisy.size
    for tag, cfg in [
        ("32mp_p4096_m50_h.15", _base(4096, 50, 0.15, n)),
        ("32mp_p8192_m200_h.15", _base(8192, 200, 0.15, n)),
        ("32mp_mv_identity_h.15", _base(4096, 50, 0.15, n).replace(
            filter_mode="matvec", filter_name="identity",
            fused_finish=False)),
    ]:
        _run(tag, cfg, img, noisy)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("grid", "h", "matvec", "refine", "tiled", "all"):
        img, noisy = _workload(2048, 4096)            # the graded 8 MP shape
        if which in ("h", "all"):
            sweep_h(img, noisy)
        if which in ("matvec", "all"):
            sweep_matvec(img, noisy)
        if which in ("refine", "all"):
            sweep_refine(img, noisy)
        if which in ("grid", "all"):
            sweep_grid(img, noisy)
        if which in ("tiled", "all"):
            sweep_tiled(img, noisy)
    if which == "crossover":
        sweep_crossover()
    if which in ("32mp", "all"):
        sweep_32mp()


if __name__ == "__main__":
    main()
