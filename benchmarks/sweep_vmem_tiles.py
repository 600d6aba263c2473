"""Does raising Mosaic's scoped-VMEM limit unlock fatter fused-finish tiles?

Every tile cap in ops/pallas_streaming.py (_tile_n, EMIT_TN, FIN_TN and the
ext2/VPU-consume notes) was measured against Mosaic's DEFAULT 16 MB scoped
VMEM limit. A v5e core physically carries ~128 MiB of VMEM — the limit is a
compiler default, not the hardware — so `CompilerParams(vmem_limit_bytes=…)`
may admit wider column tiles: fewer, fatter grid steps on the same
schedule. This sweep times the two fused-finish passes (the cfg4 wall) and
the strip matvec/rmatvec at the 8 MP cfg4 shape across (tn, vmem_limit).

    python benchmarks/sweep_vmem_tiles.py            # real TPU

Appends rows to benchmarks/results/vmem_tiles.jsonl.
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

from graphlap_tpu.ops import pallas_streaming as ps

RESULTS = Path(__file__).parent / "results" / "vmem_tiles.jsonl"

P_PAD = 4096
N_PAD = 8 * 1024 * 1024   # the 8 MP cfg4 shape
DP = 32
M_PAD = 128


def _params(vmem_mb):
    if vmem_mb is None:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=vmem_mb << 20)


@functools.partial(jax.jit, static_argnames=("tn", "vmem_mb"))
def ext2_var(fa, f_t, t2, bm, tn: int, vmem_mb):
    """ext2_matvec_pallas with an explicit (tn, vmem limit)."""
    grid = (N_PAD // tn,)
    u, s = pl.pallas_call(
        ps._ext2_matvec_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((P_PAD, DP), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((DP, tn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, P_PAD), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((P_PAD, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P_PAD, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, N_PAD), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * P_PAD * N_PAD * (DP + 3),
            bytes_accessed=(P_PAD + N_PAD) * DP * 2
            + 4 * (3 * P_PAD + 2 * N_PAD),
            transcendentals=P_PAD * N_PAD,
        ),
        compiler_params=_params(vmem_mb),
    )(fa, f_t, t2.astype(fa.dtype), bm.reshape(1, N_PAD))
    return u[:, 0], s[0]


@functools.partial(jax.jit, static_argnames=("tn", "vmem_mb"))
def finish_var(fa, f_t, t, s_pre, bm, gr, y, na, nb, tn: int, vmem_mb):
    """finish_colstats_pallas with an explicit (tn, vmem limit)."""
    grid = (N_PAD // tn,)
    v, ns, co, s = pl.pallas_call(
        ps._finish_colstats_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((P_PAD, DP), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((DP, tn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_PAD), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P_PAD, M_PAD), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P_PAD, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tn, M_PAD), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M_PAD), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M_PAD), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N_PAD, M_PAD), jnp.float32),
            jax.ShapeDtypeStruct((1, M_PAD), jnp.float32),
            jax.ShapeDtypeStruct((1, M_PAD), jnp.float32),
            jax.ShapeDtypeStruct((1, N_PAD), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * P_PAD * N_PAD * (DP + M_PAD + 1),
            bytes_accessed=(P_PAD + N_PAD) * DP * 2
            + 4 * N_PAD * (M_PAD + 4) + 4 * P_PAD * (M_PAD + 2),
            transcendentals=P_PAD * N_PAD,
        ),
        compiler_params=_params(vmem_mb),
    )(fa, f_t, t.astype(fa.dtype).reshape(1, P_PAD),
      s_pre.reshape(1, N_PAD), bm.reshape(1, N_PAD), gr,
      y.reshape(1, N_PAD), na.reshape(P_PAD, 1), nb.reshape(1, N_PAD))
    return v, ns[0], co[0], s[0]


@functools.partial(jax.jit, static_argnames=("tn", "vmem_mb"))
def matvec_var(fa, f_t, v, tn: int, vmem_mb):
    grid = (1, N_PAD // tn)
    out = pl.pallas_call(
        ps._matvec_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((P_PAD, DP), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((DP, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((P_PAD, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P_PAD, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * P_PAD * N_PAD * (DP + 1),
            bytes_accessed=(P_PAD + N_PAD) * DP * 2 + 4 * (P_PAD + N_PAD),
            transcendentals=P_PAD * N_PAD,
        ),
        compiler_params=_params(vmem_mb),
    )(fa, f_t, v.astype(fa.dtype).reshape(1, N_PAD))
    return out[:, 0]


def main():
    assert jax.default_backend() != "cpu", "run on the TPU"
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    fa = jnp.asarray(rng.random((P_PAD, DP)) * 0.1, dtype)
    f_t = jnp.asarray(rng.random((DP, N_PAD)) * 0.1, dtype)
    t2 = jnp.asarray(rng.random((2, P_PAD)), jnp.float32)
    bm = jnp.ones((N_PAD,), jnp.float32)
    t = jnp.asarray(rng.random(P_PAD), jnp.float32)
    s_pre = jnp.asarray(rng.random(N_PAD), jnp.float32)
    gr = jnp.asarray(rng.random((P_PAD, M_PAD)), jnp.float32)
    y = jnp.asarray(rng.random(N_PAD), jnp.float32)
    na = jnp.sum(fa.astype(jnp.float32) ** 2, axis=1)
    nb = jnp.sum(f_t.astype(jnp.float32) ** 2, axis=0)

    sync = jax.jit(jnp.sum)

    def wall(f, *a, reps=5):
        float(sync(jax.tree.leaves(f(*a))[0]))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(sync(jax.tree.leaves(f(*a))[0]))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    RESULTS.parent.mkdir(parents=True, exist_ok=True)
    v = jnp.asarray(rng.random(N_PAD), jnp.float32)
    cases = []
    for tn in (512, 1024, 2048, 4096):
        for vm in (None, 64, 100):
            cases.append(("ext2", tn, vm,
                          lambda tn=tn, vm=vm: wall(ext2_var, fa, f_t, t2,
                                                    bm, tn, vm)))
            cases.append(("finish", tn, vm,
                          lambda tn=tn, vm=vm: wall(finish_var, fa, f_t, t,
                                                    s_pre, bm, gr, y, na,
                                                    nb, tn, vm)))
            cases.append(("matvec", tn, vm,
                          lambda tn=tn, vm=vm: wall(matvec_var, fa, f_t, v,
                                                    tn, vm)))

    for name, tn, vm, run in cases:
        try:
            w = run()
            rec = {"pass": name, "tn": tn, "vmem_mb": vm,
                   "wall_s": round(w, 4), "ok": True, "ts": time.time()}
        except Exception as e:  # compile OOM etc. — record, keep sweeping
            rec = {"pass": name, "tn": tn, "vmem_mb": vm, "ok": False,
                   "err": str(e).split("\n")[0][:200], "ts": time.time()}
        with RESULTS.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
