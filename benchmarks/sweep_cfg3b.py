"""cfg3 accelerator decomposition: WHICH knob breaks parity at h=0.15?

sweep_cfg3.py showed every coarse/polish recipe 1.8-4.6 dB off the exact
trajectory at the retuned CONFIG3 (h=0.15, beta=0.6 sharpen) — including
the full-res-Sinkhorn current matrix recipe — so the error is not in the
Sinkhorn or gram decimation. This isolates the remaining accelerators one
at a time (bf16 tiles / Pallas kernels / gram_coarse) at full-res Sinkhorn.
Appends to benchmarks/results/cfg3_sweep.jsonl.
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

RESULTS = Path(__file__).parent / "results" / "cfg3_sweep.jsonl"

from sweep_cfg3 import device_wall_and_out


def main():
    import graphlap_tpu as gl
    from graphlap_tpu.models.pipeline import make_plan

    img = gl.make_test_image(1024, 1024)
    # pinned SPECTRAL — see sweep_cfg3.py; the second recorded run of this
    # script accidentally picked up CONFIG3's new matvec default (its
    # diag_* rows measure the FIXED path: 69-86 dB agreement, gram a no-op)
    base = gl.CONFIG3.replace(streaming=True, block_cols=131072,
                              filter_mode="spectral")
    exact = base.replace(affinity_dtype="float32", use_pallas=False)

    recipes = {
        # NB "diag_f32_pallas_gc1" (f32 + Pallas) is omitted: the f32
        # matvec tiling at block_cols=131072 exceeds the 16M scoped-VMEM
        # limit at 1024^2 (17.92M) — production Pallas recipes are bf16
        "diag_f32_xla_gc4": exact.replace(gram_coarse=4),
        "diag_bf16_xla_gc1": exact.replace(affinity_dtype="bfloat16"),
        "diag_bf16_pallas_gc1": exact.replace(affinity_dtype="bfloat16",
                                              use_pallas=True),
    }

    mp = 1024 * 1024 / 1e6
    for seed in (3, 11):
        noisy = np.clip(gl.add_gaussian_noise(img, 0.03, seed=seed), 0, 1)
        plan = make_plan(noisy, base)
        _, ref = device_wall_and_out(noisy, exact, plan, reps=1)
        psnr_ref = gl.psnr(img, ref)
        for name, cfg in recipes.items():
            wall, out = device_wall_and_out(noisy, cfg, plan, reps=1)
            rec = {
                "recipe": name, "seed": seed,
                "device_wall_s": round(wall, 4),
                "psnr_vs_f32_db": round(gl.psnr(ref, out), 2),
                "dpsnr_vs_clean_db": round(
                    abs(gl.psnr(img, out) - psnr_ref), 4),
                "psnr_out_db": round(gl.psnr(img, out), 3),
                "psnr_ref_db": round(psnr_ref, 3),
                "p": plan.p, "config_hash": cfg.config_hash(),
                "ts": time.time(),
            }
            RESULTS.parent.mkdir(parents=True, exist_ok=True)
            with RESULTS.open("a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
