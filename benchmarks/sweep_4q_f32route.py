"""Candidate gate-compliant 4q routes on the bad draw (f32 tiles).

sweep_4q_baddraw.py isolated the cross-draw gate violation to the bf16
distance tiles themselves (f32feat+coarse+pol3: 0.002 dB; bf16+FULL-res
Sinkhorn: 0.104 dB — polish cannot contract tile precision). This times
the f32-feature route WITH the Pallas streaming kernels (plain f32
layout) at pol1/pol2 to pick the fastest compliant recipe for
tuned_config's matvec-denoise "fast" branch.

    python benchmarks/sweep_4q_f32route.py        # real TPU
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

    f32 = q.replace(affinity_dtype="float32", feature_dtype="float32")
    recipes = [
        ("f32pallas_pol1", f32.replace(sinkhorn_polish=1)),
        ("f32pallas_pol2", f32),     # q ships pol2 on this branch
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
