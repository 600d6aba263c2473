"""Strip-emitter tile sweep under the raised VMEM limit.

affinity_strip_pallas emits (TILE_P=128, TILE_N=512) tiles — sized for
Mosaic's default 16 MB scoped-VMEM limit. At the cfg2 strip_cache shape
(p=5243, N=262144) that is ~21k grid steps to write a 2.75 GB bf16 strip
whose pure HBM-write floor is ~4 ms; per-step overhead could dominate the
strip-build stage. With VMEM_LIMIT_BYTES=64MB (pallas_streaming), fatter
tiles are admissible — sweep (tp, tn) at the cfg2 and cfg3-channel shapes.

    python benchmarks/sweep_emit_tiles.py

Appends to benchmarks/results/vmem_tiles.jsonl (pass="emit").
"""

from __future__ import annotations

import functools
import json
import time
from pathlib import Path

import jax

from graphlap_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache(Path(__file__).parent.parent)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graphlap_tpu.ops.pallas_affinity import _affinity_kernel
from graphlap_tpu.ops.pallas_streaming import VMEM_LIMIT_BYTES

RESULTS = Path(__file__).parent / "results" / "vmem_tiles.jsonl"

DP = 32


def _cdiv(a, b):
    return -(-a // b)


@functools.partial(jax.jit, static_argnames=("tp", "tn", "lift"))
def emit_var(a, bt, tp: int, tn: int, lift: bool):
    p_pad, n_pad = a.shape[0], bt.shape[1]
    grid = (p_pad // tp, n_pad // tn)
    params = (pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES)
              if lift else None)
    return pl.pallas_call(
        _affinity_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tp, DP), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((DP, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tp, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p_pad, n_pad), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * p_pad * n_pad * DP,
            bytes_accessed=(p_pad * DP + DP * n_pad) * a.dtype.itemsize
            + p_pad * n_pad * 2,
            transcendentals=p_pad * n_pad,
        ),
        compiler_params=params,
    )(a, bt)


def main():
    assert jax.default_backend() != "cpu", "run on the TPU"
    rng = np.random.default_rng(0)
    sync = jax.jit(lambda x: jnp.sum(x[:: max(1, x.shape[0] // 8)]))

    def wall(f, *a, reps=7):
        float(sync(f(*a)))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(sync(f(*a)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    RESULTS.parent.mkdir(parents=True, exist_ok=True)
    # cfg2 strip_cache shape (p=5243 -> pad per tile), cfg3 channel shape
    for (p, n, label) in ((5243, 262144, "cfg2"), (4096, 1048576, "cfg3ch")):
        for tp, tn, lift in ((128, 512, False), (128, 2048, True),
                             (128, 4096, True), (256, 2048, True),
                             (512, 2048, True), (512, 4096, True),
                             (1024, 2048, True)):
            p_pad = _cdiv(p, tp) * tp
            n_pad = _cdiv(n, tn) * tn
            a = jnp.asarray(rng.random((p_pad, DP)) * 0.1, jnp.bfloat16)
            bt = jnp.asarray(rng.random((DP, n_pad)) * 0.1, jnp.bfloat16)
            try:
                w = wall(emit_var, a, bt, tp, tn, lift)
                rec = {"pass": "emit", "shape": label, "tp": tp, "tn": tn,
                       "vmem_mb": 64 if lift else None, "p_pad": p_pad,
                       "n_pad": n_pad, "wall_s": round(w, 4), "ok": True,
                       "ts": time.time()}
            except Exception as e:
                rec = {"pass": "emit", "shape": label, "tp": tp, "tn": tn,
                       "vmem_mb": 64 if lift else None, "ok": False,
                       "err": str(e).split("\n")[0][:200], "ts": time.time()}
            with RESULTS.open("a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
