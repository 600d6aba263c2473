"""ext2 consume A/B under the raised VMEM limit (companion to
ab_matvec_consume.py). The ext2 kernel kept its rank-1 MXU consume because
both VPU variants exceeded Mosaic's DEFAULT 16 MB scoped-VMEM limit at the
(4096, 1024) tile; with VMEM_LIMIT_BYTES=64MB they compile — does the
matvec kernel's measured 1.11x VPU win carry over? Appends to
benchmarks/results/ab_matvec_consume.jsonl."""

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

RESULTS = Path(__file__).parent / "results" / "ab_matvec_consume.jsonl"

P_PAD = 4096
N_PAD = 8 * 1024 * 1024
DP = 32


def _ext2_vpu_kernel(a_ref, b_ref, t2_ref, bm_ref, u_ref, s_ref):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        u_ref[:] = jnp.zeros_like(u_ref)

    dtype = a_ref.dtype
    prec = "default" if dtype == jnp.bfloat16 else "highest"
    kb = ps._kb_tile(a_ref[:], b_ref[:], dtype)
    kbt = jnp.dot(t2_ref[:], kb, preferred_element_type=jnp.float32,
                  precision=prec)
    prod = jnp.maximum(kbt[0:1, :] * kbt[1:2, :], ps.FINISH_EPS)
    s = bm_ref[:] / jnp.sqrt(prod)
    s_ref[:] = s
    # VPU consume: f32 product + lane reduction (the matvec kernel's form)
    u_ref[:] += jnp.sum(kb.astype(jnp.float32) * s, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("tn", "vpu"))
def ext2_ab(fa, f_t, t2, bm, tn: int, vpu: bool):
    grid = (N_PAD // tn,)
    kern = _ext2_vpu_kernel if vpu else ps._ext2_matvec_kernel
    u, s = pl.pallas_call(
        kern,
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
        compiler_params=ps._cparams(),
    )(fa, f_t, t2.astype(fa.dtype), bm.reshape(1, N_PAD))
    return u[:, 0], s[0]


def main():
    assert jax.default_backend() != "cpu", "run on the TPU"
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    fa = jnp.asarray(rng.random((P_PAD, DP)) * 0.1, dtype)
    f_t = jnp.asarray(rng.random((DP, N_PAD)) * 0.1, dtype)
    t2 = jnp.asarray(rng.random((2, P_PAD)), jnp.float32)
    bm = jnp.ones((N_PAD,), jnp.float32)
    sync = jax.jit(jnp.sum)

    def wall(tn, vpu, reps=7):
        float(sync(ext2_ab(fa, f_t, t2, bm, tn, vpu)[0]))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(sync(ext2_ab(fa, f_t, t2, bm, tn, vpu)[0]))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    RESULTS.parent.mkdir(parents=True, exist_ok=True)
    for tn in (1024, 2048):
        recs = {}
        for vpu in (False, True):
            try:
                recs[vpu] = wall(tn, vpu)
            except Exception as e:
                recs[vpu] = str(e).split("\n")[0][:200]
        u_m, _ = ext2_ab(fa, f_t, t2, bm, tn, False)
        u_v, _ = ext2_ab(fa, f_t, t2, bm, tn, True)
        rel = float(jnp.max(jnp.abs(u_m - u_v))
                    / (jnp.max(jnp.abs(u_m)) + 1e-30))
        rec = {"pass": "ext2", "tn": tn, "vmem_mb": 64,
               "t_mxu_consume_s": recs[False] if isinstance(recs[False], float) else None,
               "t_vpu_consume_s": recs[True] if isinstance(recs[True], float) else None,
               "err_mxu": None if isinstance(recs[False], float) else recs[False],
               "err_vpu": None if isinstance(recs[True], float) else recs[True],
               "max_rel_diff": rel, "ts": time.time()}
        if isinstance(recs[False], float) and isinstance(recs[True], float):
            rec["speedup"] = round(recs[False] / recs[True], 3)
        with RESULTS.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
