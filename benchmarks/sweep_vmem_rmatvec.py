"""rmatvec tile-width sweep under the raised VMEM limit (companion to
sweep_vmem_tiles.py — rmatvec was not in the first pass). Appends to
benchmarks/results/vmem_tiles.jsonl."""

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

from graphlap_tpu.ops import pallas_streaming as ps

RESULTS = Path(__file__).parent / "results" / "vmem_tiles.jsonl"

P_PAD = 4096
N_PAD = 8 * 1024 * 1024
DP = 32


def _params(vmem_mb):
    if vmem_mb is None:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=vmem_mb << 20)


@functools.partial(jax.jit, static_argnames=("tn", "vmem_mb"))
def rmatvec_var(fa, f_t, t, tn: int, vmem_mb):
    grid = (N_PAD // tn, 1)
    out = pl.pallas_call(
        ps._rmatvec_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((P_PAD, DP), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((DP, tn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_PAD), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tn), lambda j, i: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N_PAD), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * P_PAD * N_PAD * (DP + 1),
            bytes_accessed=(P_PAD + N_PAD) * DP * 2 + 4 * (P_PAD + N_PAD),
            transcendentals=P_PAD * N_PAD,
        ),
        compiler_params=_params(vmem_mb),
    )(fa, f_t, t.astype(fa.dtype).reshape(1, P_PAD))
    return out[0]


def main():
    assert jax.default_backend() != "cpu", "run on the TPU"
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    fa = jnp.asarray(rng.random((P_PAD, DP)) * 0.1, dtype)
    f_t = jnp.asarray(rng.random((DP, N_PAD)) * 0.1, dtype)
    t = jnp.asarray(rng.random(P_PAD), jnp.float32)
    sync = jax.jit(jnp.sum)

    def wall(f, *a, reps=7):
        float(sync(f(*a)))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(sync(f(*a)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    RESULTS.parent.mkdir(parents=True, exist_ok=True)
    for tn, vm in ((1024, None), (1024, 64), (2048, 64), (4096, 64)):
        try:
            w = wall(rmatvec_var, fa, f_t, t, tn, vm)
            rec = {"pass": "rmatvec", "tn": tn, "vmem_mb": vm,
                   "wall_s": round(w, 4), "ok": True, "ts": time.time()}
        except Exception as e:
            rec = {"pass": "rmatvec", "tn": tn, "vmem_mb": vm, "ok": False,
                   "err": str(e).split("\n")[0][:200], "ts": time.time()}
        with RESULTS.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
