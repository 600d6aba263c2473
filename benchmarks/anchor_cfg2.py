"""Direct f64 oracle anchor at the GRADED cfg2 shape (VERDICT r3 #6).

Round-3's parity chain for cfg2 was transitive: oracle == f32-exact at
384**2, then recipe vs f32-exact at 512**2. This script closes the chain
by running the float64 numpy oracle (tests/oracle.py) at the actual
graded shape — 512x512, NLM 5x5, 2% sample (p = 5243), m = 50,
Sinkhorn(20), identity filter, the EXACT workload bench.py grades
(same test image, same noise seed) — and comparing:

  * the all-f32 exact pipeline (gl.CONFIG2, the in-repo "CPU reference"
    bench.py pins as its baseline contract);
  * the TPU headline recipe (bfloat16_store + Sinkhorn 8 + randomized
    sketch o206/p0 + dense-coarse Sinkhorn 1/16 + 1 polish) on the CPU
    backend (no Pallas — numerics of the recipe, not the kernel).

Cost profile on this box (62.5 GFLOP/s single-core dgemm, 125 GB RAM):
strip build ~2 s, Sinkhorn(20) ~10 s, gram 2*p^2*N = 1.4e13 FLOPs
~4 min, eigh(p=5243) f64 a few min => ~10-25 min total; strip f64 is
11 GB resident.  Run in the background.

The oracle output image is also saved to
benchmarks/results/oracle_cfg2_512.npy so the TPU-side run (which can't
execute the f64 oracle) can append a direct TPU-vs-oracle row later.

Appends to benchmarks/results/parity_anchor.jsonl with side=512 and
anchor="graded_cfg2".
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))   # tests.oracle
# jax is pre-imported at interpreter startup on this box (a .pth hook),
# so JAX_* env mutations are no-ops — use the config API (CLAUDE.md).
import jax

jax.config.update("jax_platforms", "cpu")

from graphlap_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache(Path(__file__).parent.parent, cpu=True)

import numpy as np

RESULTS = Path(__file__).parent / "results" / "parity_anchor.jsonl"
ORACLE_NPY = Path(__file__).parent / "results" / "oracle_cfg2_512.npy"


def main():
    import graphlap_tpu as gl
    from graphlap_tpu.models.pipeline import make_plan
    from tests.oracle import oracle_filter_image

    cfg = gl.CONFIG2                       # the graded cfg2 contract
    img = gl.make_test_image(512, 512)     # bench.py's exact workload
    noisy = np.clip(gl.add_gaussian_noise(img, 0.1, seed=1), 0, 1)
    plan = make_plan(noisy, cfg)
    print(f"p = {plan.p}", flush=True)

    t0 = time.perf_counter()
    orc, _ = oracle_filter_image(noisy, cfg, plan=plan)
    oracle_wall = time.perf_counter() - t0
    psnr_oracle = gl.psnr(img, orc)
    np.save(ORACLE_NPY, orc.astype(np.float32))
    recs = [{"recipe": "oracle_f64", "side": 512, "p": plan.p,
             "anchor": "graded_cfg2",
             "psnr_out_db": round(psnr_oracle, 4),
             "wall_s": round(oracle_wall, 1), "ts": time.time()}]
    print(json.dumps(recs[0]), flush=True)

    headline = cfg.replace(
        affinity_dtype="bfloat16_store", sinkhorn_iters=8, solver="sketch",
        sketch_oversample=206, sketch_power=0,
        sinkhorn_coarse=16, sinkhorn_polish=1)
    for name, rcfg in [("f32_exact", cfg), ("headline_recipe", headline)]:
        res = gl.filter_image(noisy, rcfg, plan=plan)
        po = gl.psnr(img, res.image)
        recs.append({
            "recipe": name, "side": 512, "p": plan.p,
            "anchor": "graded_cfg2", "backend": "cpu",
            "psnr_out_db": round(po, 4),
            "dpsnr_vs_oracle_db": round(abs(po - psnr_oracle), 4),
            "psnr_vs_oracle_db": round(gl.psnr(orc, res.image), 2),
            "ts": time.time(),
        })
        print(json.dumps(recs[-1]), flush=True)

    with RESULTS.open("a") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
