"""cfg2 (512^2 NLM, p=5243) precision-policy sweep on the real chip.

The dense path's eigensolve stage is dominated by the O(Np^2) cross GEMM
(0.58 s of the 0.92 s device wall in round 1); this sweep measures the
bf16-cross-only policy (gram_dtype) against full-f32 and full-bf16, with
PSNR parity vs the f32 output. Appends to benchmarks/results/cfg2_sweep.jsonl.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

# jax is pre-imported at interpreter startup on this box (a .pth
# hook), so JAX_* env mutations here are no-ops — only the config
# API takes effect (same trap as JAX_PLATFORMS; CLAUDE.md)
import jax

from graphlap_tpu.utils.cache import setup_compilation_cache
setup_compilation_cache(Path(__file__).parent.parent)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np

RESULTS = Path(__file__).parent / "results" / "cfg2_sweep.jsonl"


def device_wall_and_out(image, cfg, plan, reps=3):
    import jax
    import jax.numpy as jnp
    from graphlap_tpu.models.pipeline import _filter_channel

    img = jax.device_put(jnp.asarray(image, jnp.float32))
    idx_a = jax.device_put(jnp.asarray(plan.idx_a))
    perm = jax.device_put(jnp.asarray(plan.perm))
    inv_perm = jax.device_put(jnp.asarray(plan.inv_perm))
    sync = jax.jit(jnp.sum)
    z, _ = _filter_channel(img, idx_a, perm, inv_perm, cfg)
    float(sync(z))
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        z, _ = _filter_channel(img, idx_a, perm, inv_perm, cfg)
        float(sync(z))
        walls.append(time.perf_counter() - t0)
    return min(walls), np.asarray(z)


def main():
    import graphlap_tpu as gl
    from graphlap_tpu.models.pipeline import make_plan

    img = gl.make_test_image(512, 512)
    noisy = np.clip(gl.add_gaussian_noise(img, 0.1, seed=1), 0, 1)
    base = gl.CONFIG2.replace(use_pallas=True)
    plan = make_plan(noisy, base)
    mp = 512 * 512 / 1e6

    recipes = [
        ("f32", base),
        ("f32_bf16gram", base.replace(gram_dtype="bfloat16")),
        ("bf16_all", base.replace(affinity_dtype="bfloat16")),
        ("bf16_all_f32gram", base.replace(affinity_dtype="bfloat16",
                                          gram_dtype="float32")),
        # round 2b: f32 math + bf16 strip STORAGE (gram auto-bf16) — halves
        # every downstream strip read without the distance-GEMM cancellation
        ("bf16_store", base.replace(affinity_dtype="bfloat16_store")),
        ("bf16_store_iters10", base.replace(affinity_dtype="bfloat16_store",
                                            sinkhorn_iters=10)),
        ("f32_bf16gram_iters10", base.replace(gram_dtype="bfloat16",
                                              sinkhorn_iters=10)),
    ]
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
            rec["psnr_vs_f32_db"] = round(gl.psnr(ref_out, out), 2)
            rec["dpsnr_vs_clean_db"] = round(
                abs(gl.psnr(img, out) - gl.psnr(img, ref_out)), 4)
        with RESULTS.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
