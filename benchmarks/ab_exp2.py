"""A/B: jnp.exp vs jnp.exp2 on the VPU at streaming-pass shapes.

The fused/streaming kernel passes are exp-bound (ab_dpad.py: width-32 and
width-128 GEMMs time identically at 8 MP — the transcendental dominates).
exp(-d2) can become exp2(-d2') for free by folding sqrt(log2 e) into the
feature scaling, so if the hardware exp2 is faster than exp the whole
normalize stage speeds up. This measures both (plus the fused
dist-GEMM -> exp tile in each flavor) on the real chip.

    python benchmarks/ab_exp2.py

Appends a row to benchmarks/results/ab_exp2.jsonl.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax

from graphlap_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache(Path(__file__).parent.parent)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import jax.numpy as jnp
import numpy as np

import graphlap_tpu  # noqa: F401  (pins matmul precision)

RESULTS = Path(__file__).parent / "results" / "ab_exp2.jsonl"


def _time(fn, *args, n=5):
    # host-fetched scalar as the completion fence (see ab_dpad._time)
    float(fn(*args))
    walls = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn(*args))
        walls.append(time.perf_counter() - t0)
    return min(walls)


def main():
    rec = {"backend": jax.default_backend(),
           "device": str(jax.devices()[0]), "ts": time.time()}
    rng = np.random.default_rng(0)

    # raw transcendental throughput, f32 and bf16, at a Sinkhorn-pass
    # element count (p x block = 4096 x 131072 ~ 5.4e8)
    shape = (4096, 131072)
    x32 = jnp.asarray(rng.uniform(0.0, 8.0, shape).astype(np.float32))
    for name, xs in (("f32", x32), ("bf16", x32.astype(jnp.bfloat16))):
        e1 = jax.jit(lambda a: jnp.sum(jnp.exp(-a).astype(jnp.float32)))
        e2 = jax.jit(lambda a: jnp.sum(jnp.exp2(-a).astype(jnp.float32)))
        rec[f"exp_{name}_s"] = round(_time(e1, xs), 6)
        rec[f"exp2_{name}_s"] = round(_time(e2, xs), 6)
        rec[f"speedup_{name}"] = round(
            rec[f"exp_{name}_s"] / max(rec[f"exp2_{name}_s"], 1e-9), 3)

    # fused dist-GEMM -> exp vs -> exp2 (the actual streaming tile shape)
    p, blk, d = 4096, 131072, 32
    fa = jnp.asarray(rng.normal(0, 0.3, (p, d)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    fb = jnp.asarray(rng.normal(0, 0.3, (d, blk)).astype(np.float32)
                     ).astype(jnp.bfloat16)

    def tile(f, a, b):
        cross = jnp.dot(a, b, preferred_element_type=jnp.float32,
                        precision="default")
        na = jnp.sum(a.astype(jnp.float32) ** 2, 1, keepdims=True)
        nb = jnp.sum(b.astype(jnp.float32) ** 2, 0, keepdims=True)
        d2 = jnp.maximum(na + nb - 2.0 * cross, 0.0)
        return jnp.sum(f(-d2))

    t_exp = jax.jit(lambda a, b: tile(jnp.exp, a, b))
    t_exp2 = jax.jit(lambda a, b: tile(jnp.exp2, a, b))
    rec["tile_exp_s"] = round(_time(t_exp, fa, fb), 6)
    rec["tile_exp2_s"] = round(_time(t_exp2, fa, fb), 6)
    rec["speedup_tile"] = round(
        rec["tile_exp_s"] / max(rec["tile_exp2_s"], 1e-9), 3)

    RESULTS.parent.mkdir(parents=True, exist_ok=True)
    with RESULTS.open("a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
