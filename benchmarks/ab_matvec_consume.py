"""A/B: the fused matvec kernel's CONSUMING dot — MXU rank-1 vs VPU sum.

Per-tile budget of matvec_pallas at the 8 MP recipe (p=4096, tn=1024,
dp=32, bf16): MXU cross GEMM ~1.5 us + VPU distance epilogue ~3 us +
consuming dot kb @ v ~6 us — the dot's rhs is ONE column, so the MXU
runs at 1/128 lane utilization and costs as if it were 128 columns wide.
Candidate: do the consume on the VPU instead (f32 multiply + row-sum),
~2 ops/element. This measures both at the production 8 MP shapes before
any kernel change ships.

    python benchmarks/ab_matvec_consume.py      # real TPU
Appends to benchmarks/results/ab_matvec_consume.jsonl.
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

from graphlap_tpu.ops.pallas_streaming import (_kb_tile, _tile_n,
                                               matvec_pallas, rmatvec_pallas)

RESULTS = Path(__file__).parent / "results" / "ab_matvec_consume.jsonl"


def _matvec_kernel_vpu(a_ref, b_ref, v_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    kb = _kb_tile(a_ref[:], b_ref[:], a_ref.dtype)
    # VPU consume: f32 multiply + lane reduction instead of the rank-1 MXU
    # dot (which pays for 128 output columns to produce 1)
    prod = kb.astype(jnp.float32) * v_ref[:].astype(jnp.float32)
    out_ref[:] += jnp.sum(prod, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=())
def matvec_vpu(feats_a_pad, feats_t, v):
    p_pad = feats_a_pad.shape[0]
    n_pad = feats_t.shape[1]
    dp = feats_a_pad.shape[1]
    dtype = feats_a_pad.dtype
    tn = _tile_n(dtype)
    grid = (1, n_pad // tn)
    out = pl.pallas_call(
        _matvec_kernel_vpu,
        grid=grid,
        in_specs=[
            pl.BlockSpec((p_pad, dp), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((p_pad, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p_pad, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * p_pad * n_pad * (dp + 1),
            bytes_accessed=(p_pad + n_pad) * dp * dtype.itemsize,
            transcendentals=p_pad * n_pad,
        ),
    )(feats_a_pad, feats_t, v.astype(dtype).reshape(1, n_pad))
    return out[:, 0]


def _rmatvec_kernel_vpu(a_ref, b_ref, t_ref, out_ref):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    kb = _kb_tile(a_ref[:], b_ref[:], a_ref.dtype)
    # VPU consume: f32 multiply + sublane reduction over the p rows
    prod = kb.astype(jnp.float32) * t_ref[:].astype(jnp.float32).T
    out_ref[:] += jnp.sum(prod, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=())
def rmatvec_vpu(feats_a_pad, feats_t, t):
    p_pad = feats_a_pad.shape[0]
    n_pad = feats_t.shape[1]
    dp = feats_a_pad.shape[1]
    dtype = feats_a_pad.dtype
    tn = _tile_n(dtype)
    grid = (n_pad // tn, 1)
    out = pl.pallas_call(
        _rmatvec_kernel_vpu,
        grid=grid,
        in_specs=[
            pl.BlockSpec((p_pad, dp), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, tn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p_pad), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tn), lambda j, i: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * p_pad * n_pad * (dp + 1),
            bytes_accessed=(p_pad + n_pad) * dp * dtype.itemsize,
            transcendentals=p_pad * n_pad,
        ),
    )(feats_a_pad, feats_t, t.astype(dtype).reshape(1, p_pad))
    return out[0]


def timed(f, *args, runs=5):
    sync = jax.jit(jnp.sum)
    float(sync(f(*args)))
    ws = []
    for _ in range(runs):
        t0 = time.perf_counter()
        float(sync(f(*args)))
        ws.append(time.perf_counter() - t0)
    return min(ws)


def main():
    rng = np.random.default_rng(0)
    p_pad, dp = 4096, 32
    n_pad = 1 << 23                      # 8.4M: the 8 MP shape class
    dtype = jnp.bfloat16
    fa = jnp.asarray(rng.random((p_pad, dp)), dtype)
    ft = jnp.asarray(rng.random((dp, n_pad)) * 0.1, dtype)
    v = jnp.asarray(rng.random((n_pad,)), jnp.float32)

    t_p = jnp.asarray(rng.random((p_pad,)), jnp.float32)

    RESULTS.parent.mkdir(parents=True, exist_ok=True)
    for name, base, cand, args in (
            ("matvec", matvec_pallas, matvec_vpu, (fa, ft, v)),
            ("rmatvec", rmatvec_pallas, rmatvec_vpu, (fa, ft, t_p))):
        t_mxu = timed(base, *args)
        t_vpu = timed(cand, *args)
        # numerics: the MXU consume multiplies in bf16 with f32 accum;
        # the VPU consume multiplies in f32 (slightly MORE precise)
        o_mxu = np.asarray(base(*args))
        o_vpu = np.asarray(cand(*args))
        rel = float(np.max(np.abs(o_mxu - o_vpu))
                    / (np.max(np.abs(o_mxu)) + 1e-30))
        rec = {"pass": name, "p_pad": p_pad, "n_pad": n_pad, "dp": dp,
               "dtype": "bfloat16",
               "t_mxu_consume_s": round(t_mxu, 4),
               "t_vpu_consume_s": round(t_vpu, 4),
               "speedup": round(t_mxu / t_vpu, 3), "max_rel_diff": rel,
               "ts": time.time()}
        with RESULTS.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
