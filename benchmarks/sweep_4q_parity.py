"""4q (8 MP matvec quality route) parity sweep.

The first on-chip cfg4_8mp_quality_matvec row measured 0.209 dB vs its
f32 full-res-Sinkhorn twin — the only headline-adjacent row outside the
0.1 dB class. In matvec mode the Sinkhorn scales enter the OUTPUT
directly (z = diag(s) K diag(s) y — no rank-m projection to absorb scale
error), so the coarse-Sinkhorn estimate plausibly needs more polish here
than the spectral route's recipes. This sweep isolates the contributors:
polish depth, coarse factor, full-res control, and f32-feature control.

    python benchmarks/sweep_4q_parity.py        # real TPU
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


def seeds_main():
    """VERDICT r4 #4: the shipped 4q route (pol2) measured 0.0898 dB on
    ONE draw — 11% from the graded gate. This mode sweeps >=4 noise
    seeds x 2 image instances of pol2 AND pol3 against the per-draw f32
    full-res twin (the cfg4 jseed harness pattern), so tuned_config's
    polish routing rests on a cross-draw bound, not one lucky draw.

        python benchmarks/sweep_4q_parity.py seeds
    """
    import graphlap_tpu as gl
    from graphlap_tpu.models.pipeline import make_plan

    h, w = 2048, 4096
    mp = h * w / 1e6
    base = gl.PipelineConfig(
        kernel="nlm", h=0.25, sample_rho=0.01, sample_cap=4096,
        num_eigvecs=50, sinkhorn_iters=10, filter_name="identity",
        streaming=True, block_cols=131072)
    q = gl.tuned_config(gl.denoise_tuned(base, 0.1), h * w, "fast")
    twin = q.replace(affinity_dtype="float32", feature_dtype="float32",
                     sinkhorn_coarse=1, sinkhorn_polish=0, use_pallas=False,
                     sinkhorn_iters=max(q.sinkhorn_iters, 10))
    RESULTS.parent.mkdir(parents=True, exist_ok=True)
    worst = {"pol2": 0.0, "pol3": 0.0}
    for iseed in (0, 1):
        img = gl.make_test_image(h, w, seed=iseed)
        plan = None
        for nseed in range(4):
            noisy = np.clip(gl.add_gaussian_noise(img, 0.1, seed=nseed),
                            0, 1)
            if plan is None:
                plan = make_plan(noisy, q)
            _, ref_out = device_wall_and_out(noisy, twin, plan, reps=1)
            psnr_ref = gl.psnr(img, ref_out)
            for name, cfg in (("pol2", q.replace(sinkhorn_polish=2)),
                              ("pol3", q.replace(sinkhorn_polish=3))):
                wall, out = device_wall_and_out(noisy, cfg, plan, reps=1)
                d = abs(gl.psnr(img, out) - psnr_ref)
                worst[name] = max(worst[name], d)
                rec = {"recipe": f"jseed_{name}", "image_seed": iseed,
                       "noise_seed": nseed,
                       "device_wall_s": round(wall, 4),
                       "device_mp_per_s": round(mp / wall, 3),
                       "psnr_out_db": round(gl.psnr(img, out), 4),
                       "psnr_ref_db": round(psnr_ref, 4),
                       "dpsnr_vs_clean_db": round(d, 4),
                       "config_hash": cfg.config_hash(),
                       "ts": time.time()}
                with RESULTS.open("a") as f:
                    f.write(json.dumps(rec) + "\n")
                print(json.dumps(rec), flush=True)
    rec = {"recipe": "jseed_summary",
           "pol2_max_dpsnr_db": round(worst["pol2"], 4),
           "pol3_max_dpsnr_db": round(worst["pol3"], 4),
           "draws": 8, "ts": time.time()}
    with RESULTS.open("a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    import graphlap_tpu as gl
    from graphlap_tpu.models.pipeline import make_plan

    h, w = 2048, 4096
    img = gl.make_test_image(h, w)
    noisy = np.clip(gl.add_gaussian_noise(img, 0.1, seed=1), 0, 1)

    base = gl.PipelineConfig(
        kernel="nlm", h=0.25, sample_rho=0.01, sample_cap=4096,
        num_eigvecs=50, sinkhorn_iters=10, filter_name="identity",
        streaming=True, block_cols=131072)
    q = gl.tuned_config(gl.denoise_tuned(base, 0.1), h * w, "fast")
    print("base 4q recipe:", {k: getattr(q, k) for k in (
        "filter_mode", "h", "sinkhorn_coarse", "sinkhorn_iters",
        "sinkhorn_polish", "sinkhorn_sample", "affinity_dtype",
        "use_pallas")}, flush=True)
    plan = make_plan(noisy, q)
    mp = h * w / 1e6

    twin = q.replace(affinity_dtype="float32", feature_dtype="float32",
                     sinkhorn_coarse=1, sinkhorn_polish=0, use_pallas=False,
                     sinkhorn_iters=max(q.sinkhorn_iters, 10))
    recipes = [
        ("twin_f32_fullres", twin),
        ("base_4q", q),
        ("pol2", q.replace(sinkhorn_polish=2)),
        ("pol3", q.replace(sinkhorn_polish=3)),
        ("sc16_pol1", q.replace(sinkhorn_coarse=16)),
        # controls: which half of the 0.209 dB is dtype, which is coarse?
        ("f32feat_coarse", q.replace(affinity_dtype="float32",
                                     feature_dtype="float32",
                                     use_pallas=False)),
        ("bf16_fullres", q.replace(sinkhorn_coarse=1, sinkhorn_polish=0,
                                   sinkhorn_iters=10)),
    ]

    ref_out = None
    RESULTS.parent.mkdir(parents=True, exist_ok=True)
    for name, cfg in recipes:
        wall, out = device_wall_and_out(noisy, cfg, plan)
        rec = {
            "recipe": name, "device_wall_s": round(wall, 4),
            "device_mp_per_s": round(mp / wall, 3),
            "psnr_out_db": round(gl.psnr(img, out), 4),
            "config_hash": cfg.config_hash(), "ts": time.time(),
        }
        if name == "twin_f32_fullres":
            ref_out = out
            rec["is_reference"] = True
        else:
            rec["psnr_vs_f32_db"] = round(gl.psnr(ref_out, out), 2)
            rec["dpsnr_vs_clean_db"] = round(
                abs(gl.psnr(img, out) - gl.psnr(img, ref_out)), 4)
        with RESULTS.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "seeds":
        seeds_main()
    else:
        main()
