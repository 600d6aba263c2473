"""Sketch-vs-LOBPCG eigensolver A/B at the cfg2 production recipe (512^2
NLM, p=5243, bfloat16_store + Pallas + 8-iter Sinkhorn) on the real chip.

The chol/LOBPCG path materializes G = W_AA^2 + W_AB W_AB^T; its cross GEMM
measured 88% of MXU peak (benchmarks/results/profile.jsonl dense_cfg2) —
at roofline, only avoidable algorithmically. The sketch solver's M-applies
are thin (p, k) strip passes, ~(p/2k)x fewer FLOPs in that phase. This
sweep records device wall + PSNR parity vs the production LOBPCG output
for (oversample, power) in a 128-lane-aligned grid.
Appends to benchmarks/results/cfg2_sweep.jsonl.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

# jax is pre-imported at interpreter startup on this box (a .pth hook),
# so JAX_* env mutations here are no-ops — use the config API (CLAUDE.md)
import jax

from graphlap_tpu.utils.cache import setup_compilation_cache
setup_compilation_cache(Path(__file__).parent.parent)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np

RESULTS = Path(__file__).parent / "results" / "cfg2_sweep.jsonl"


def main():
    import graphlap_tpu as gl
    from graphlap_tpu.models.pipeline import make_plan

    from sweep_cfg2 import device_wall_and_out

    img = gl.make_test_image(512, 512)
    noisy = np.clip(gl.add_gaussian_noise(img, 0.1, seed=1), 0, 1)
    base = gl.CONFIG2.replace(use_pallas=True,
                              affinity_dtype="bfloat16_store",
                              sinkhorn_iters=8)
    plan = make_plan(noisy, base)
    mp = 512 * 512 / 1e6

    recipes = [("lobpcg_prod", base)]
    for over, power in [(78, 2), (78, 1), (46, 2), (14, 2), (110, 1)]:
        recipes.append((f"sketch_o{over}_p{power}",
                        base.replace(solver="sketch", sketch_oversample=over,
                                     sketch_power=power)))

    ref_out = None
    RESULTS.parent.mkdir(parents=True, exist_ok=True)
    for name, cfg in recipes:
        wall, out = device_wall_and_out(noisy, cfg, plan)
        rec = {"recipe": name, "device_wall_s": round(wall, 4),
               "device_mp_per_s": round(mp / wall, 4),
               "psnr_out_db": round(gl.psnr(img, out), 4),
               "config_hash": cfg.config_hash(), "ts": time.time()}
        if ref_out is None:
            ref_out = out
            rec["is_reference"] = True
        else:
            rec["psnr_vs_prod_db"] = round(gl.psnr(ref_out, out), 2)
            rec["dpsnr_vs_clean_db"] = round(
                abs(gl.psnr(img, out) - gl.psnr(img, ref_out)), 4)
        with RESULTS.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
