"""Controls on the 4q gate-violating draw (cfg4q_parity.jsonl jseed rows).

The r5 cross-draw sweep measured the shipped pol2 route at 0.18 dB and
pol3 at 0.1175 dB on the two LOW-NOISE draws (noise std 0.0959 vs 0.0976;
ref PSNR 30.5 vs 28.68) — both over the 0.1 dB gate that the single-draw
0.0898 dB measurement had suggested was met. This isolates the blow-up on
the worst draw (image_seed 0, noise_seed 0): is it the bf16 tiles, the
coarse-Sinkhorn estimate, or the coarse gram?

    python benchmarks/sweep_4q_baddraw.py        # real TPU
Appends to benchmarks/results/cfg4q_parity.jsonl.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax

from graphlap_tpu.utils.cache import setup_compilation_cache
setup_compilation_cache(Path(__file__).parent.parent)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np

from sweep_cfg4 import device_wall_and_out

RESULTS = Path(__file__).parent / "results" / "cfg4q_parity.jsonl"


def main():
    import graphlap_tpu as gl
    from graphlap_tpu.models.pipeline import make_plan

    h, w = 2048, 4096
    mp = h * w / 1e6
    img = gl.make_test_image(h, w, seed=0)
    noisy = np.clip(gl.add_gaussian_noise(img, 0.1, seed=0), 0, 1)

    base = gl.PipelineConfig(
        kernel="nlm", h=0.25, sample_rho=0.01, sample_cap=4096,
        num_eigvecs=50, sinkhorn_iters=10, filter_name="identity",
        streaming=True, block_cols=131072)
    q = gl.tuned_config(gl.denoise_tuned(base, 0.1), h * w, "fast")
    twin = q.replace(affinity_dtype="float32", feature_dtype="float32",
                     sinkhorn_coarse=1, sinkhorn_polish=0, use_pallas=False,
                     sinkhorn_iters=max(q.sinkhorn_iters, 10))
    plan = make_plan(noisy, q)

    _, ref_out = device_wall_and_out(noisy, twin, plan, reps=1)
    psnr_ref = gl.psnr(img, ref_out)
    print("ref", round(psnr_ref, 4), flush=True)

    recipes = [
        # which error source blows up on THIS draw?
        ("bad_pol3", q.replace(sinkhorn_polish=3)),
        ("bad_f32feat_pol3", q.replace(affinity_dtype="float32",
                                       feature_dtype="float32",
                                       use_pallas=False, sinkhorn_polish=3)),
        ("bad_bf16_fullres", q.replace(sinkhorn_coarse=1, sinkhorn_polish=0,
                                       sinkhorn_iters=10)),
        ("bad_pol3_it10", q.replace(sinkhorn_polish=3, sinkhorn_iters=10)),
    ]
    RESULTS.parent.mkdir(parents=True, exist_ok=True)
    for name, cfg in recipes:
        wall, out = device_wall_and_out(noisy, cfg, plan, reps=1)
        d = abs(gl.psnr(img, out) - psnr_ref)
        rec = {"recipe": name, "image_seed": 0, "noise_seed": 0,
               "device_wall_s": round(wall, 4),
               "device_mp_per_s": round(mp / wall, 3),
               "psnr_out_db": round(gl.psnr(img, out), 4),
               "psnr_ref_db": round(psnr_ref, 4),
               "dpsnr_vs_clean_db": round(d, 4),
               "config_hash": cfg.config_hash(), "ts": time.time()}
        with RESULTS.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
