"""Kernel-schedule experiments for the fused streaming passes (VERDICT r4 #1).

The round-4 roofline says the cfg4 fused wall (0.362 s) is 5-9x off the
per-resource floors; per-kernel walls put ext2 at ~0.118 s and finish at
~0.135 s at the 8 MP shape. The per-resource accounting for ONE
full-resolution sweep (p_pad=4096, n=8.4M, dp=32, bf16):

  MXU  cross GEMM  K=32 of 128 slots -> 25% util: 2*p*n*128_eff / 175T ~ 50 ms
  VPU  d2+exp      measured composite d2exp ceiling 1.45 T/s     ~ 24 ms
  VPU  consume     astype+mul+reduce ~3 ops/elem                 ~ 26 ms

ext2 at 118 ms is close to the SERIAL sum -> the headroom is overlap
(MXU and VPU run on independent ports; a dependency-chained body can't
use them together) plus removing VPU ops. Variants measured here:

  cross      cross GEMM only + trivial consume        (the MXU floor)
  d2exp      + d2 + exp (no consume)                  (adds the VPU chain)
  cur        the production kernels as-is
  aug        AUGMENTED-GEMM distances: fa' = [-2f, na, 1], f_t' = [f; 1; nb]
             so the MXU accumulator emits d2 directly — removes the
             na+nb adds, the in-kernel norm recompute, and the f32 casts
  split{2,4} sub-tile interleave: all crosses issued before any exp, so
             the scheduler can overlap chunk k+1's MXU with chunk k's VPU
  aug_split2 both

    python benchmarks/sweep_kernel_sched.py            # real TPU
Appends rows to benchmarks/results/kernel_sched.jsonl.
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

RESULTS = Path(__file__).parent / "results" / "kernel_sched.jsonl"

P_PAD = 4096
N_PAD = 8 * 1024 * 1024
D = 25
DP = 32
M_PAD = 128
EPS = ps.FINISH_EPS


def _params():
    return pltpu.CompilerParams(vmem_limit_bytes=ps.VMEM_LIMIT_BYTES)


# --------------------------------------------------------------------------
# ext2-class variants (matvec-like: (p,) accumulator + (n,) scales out)
# --------------------------------------------------------------------------

def _cross_only_kernel(a_ref, b_ref, t2_ref, bm_ref, u_ref, s_ref):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        u_ref[:] = jnp.zeros_like(u_ref)

    cross = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32,
                    precision="default")
    # cheapest possible consume that keeps the GEMM alive
    u_ref[:] += jnp.sum(cross, axis=1, keepdims=True)
    s_ref[:] = cross[0:1, :]


def _d2exp_kernel(a_ref, b_ref, t2_ref, bm_ref, u_ref, s_ref):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        u_ref[:] = jnp.zeros_like(u_ref)

    kb = ps._kb_tile(a_ref[:], b_ref[:], a_ref.dtype)
    u_ref[:] += jnp.sum(kb.astype(jnp.float32), axis=1, keepdims=True)
    s_ref[:] = kb[0:1, :].astype(jnp.float32)


def _kb_tile_aug(a_ref, b_ref):
    """exp(-d2) with d2 straight from the augmented GEMM accumulator."""
    d2 = jnp.maximum(
        jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32,
                precision="default"), 0.0)
    if a_ref.dtype == jnp.bfloat16:
        return jnp.exp(-d2.astype(jnp.bfloat16))
    return jnp.exp(-d2)


def _ext2_aug_kernel(a_ref, b_ref, t2_ref, bm_ref, u_ref, s_ref):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        u_ref[:] = jnp.zeros_like(u_ref)

    dtype = a_ref.dtype
    prec = "default" if dtype == jnp.bfloat16 else "highest"
    kb = _kb_tile_aug(a_ref, b_ref)
    kbt = jnp.dot(t2_ref[:], kb, preferred_element_type=jnp.float32,
                  precision=prec)
    prod = jnp.maximum(kbt[0:1, :] * kbt[1:2, :], EPS)
    s = bm_ref[:] / jnp.sqrt(prod)
    s_ref[:] = s
    u_ref[:] += jnp.sum(kb.astype(jnp.float32) * s, axis=1, keepdims=True)


def _make_ext2_split_kernel(nsplit: int, aug: bool):
    def kernel(a_ref, b_ref, t2_ref, bm_ref, u_ref, s_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            u_ref[:] = jnp.zeros_like(u_ref)

        dtype = a_ref.dtype
        prec = "default" if dtype == jnp.bfloat16 else "highest"
        tn = b_ref.shape[1]
        w = tn // nsplit
        a = a_ref[:]
        # phase 1: all crosses (MXU) — no VPU dependency between them
        crosses = []
        for k in range(nsplit):
            bk = b_ref[:, k * w:(k + 1) * w]
            crosses.append(jnp.dot(a, bk,
                                   preferred_element_type=jnp.float32,
                                   precision="default"))
        if not aug:
            af = a.astype(jnp.float32)
            na = jnp.sum(af * af, axis=1, keepdims=True)
        acc = None
        for k in range(nsplit):
            if aug:
                d2 = jnp.maximum(crosses[k], 0.0)
            else:
                bf = b_ref[:, k * w:(k + 1) * w].astype(jnp.float32)
                nb = jnp.sum(bf * bf, axis=0, keepdims=True)
                d2 = jnp.maximum(na + nb - 2.0 * crosses[k], 0.0)
            kb = (jnp.exp(-d2.astype(jnp.bfloat16))
                  if dtype == jnp.bfloat16 else jnp.exp(-d2))
            kbt = jnp.dot(t2_ref[:], kb, preferred_element_type=jnp.float32,
                          precision=prec)
            prod = jnp.maximum(kbt[0:1, :] * kbt[1:2, :], EPS)
            s = bm_ref[:, k * w:(k + 1) * w] / jnp.sqrt(prod)
            s_ref[:, k * w:(k + 1) * w] = s
            part = jnp.sum(kb.astype(jnp.float32) * s, axis=1, keepdims=True)
            acc = part if acc is None else acc + part
        u_ref[:] += acc
    return kernel


@functools.partial(jax.jit, static_argnames=("kernel_id", "tn"))
def ext2_variant(fa, f_t, t2, bm, kernel_id: str, tn: int):
    kernels = {
        "cross": _cross_only_kernel,
        "d2exp": _d2exp_kernel,
        "cur": ps._ext2_matvec_kernel,
        "aug": _ext2_aug_kernel,
        "split2": _make_ext2_split_kernel(2, False),
        "split4": _make_ext2_split_kernel(4, False),
        "aug_split2": _make_ext2_split_kernel(2, True),
        "aug_split4": _make_ext2_split_kernel(4, True),
    }
    grid = (N_PAD // tn,)
    u, s = pl.pallas_call(
        kernels[kernel_id],
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
        compiler_params=_params(),
    )(fa, f_t, t2.astype(fa.dtype), bm.reshape(1, N_PAD))
    return u[:, 0], s[0]


# --------------------------------------------------------------------------
# finish-class variants (adds the K=p V GEMM per tile)
# --------------------------------------------------------------------------

def _make_finish_split_kernel(nsplit: int):
    def kernel(a_ref, b_ref, t_ref, sp_ref, bm_ref, g_ref, y_ref,
               na_ref, nb_ref, v_ref, ns_ref, co_ref, s_ref):
        j = pl.program_id(0)
        dtype = a_ref.dtype
        prec = "default" if dtype == jnp.bfloat16 else "highest"
        tn = b_ref.shape[1]
        w = tn // nsplit
        a = a_ref[:]
        crosses = [jnp.dot(a, b_ref[:, k * w:(k + 1) * w],
                           preferred_element_type=jnp.float32,
                           precision=prec) for k in range(nsplit)]
        ns_acc = None
        co_acc = None
        for k in range(nsplit):
            sl = slice(k * w, (k + 1) * w)
            d2 = jnp.maximum(na_ref[:] + nb_ref[:, sl] - 2.0 * crosses[k],
                             0.0)
            kb = jnp.exp(-d2).astype(dtype)
            ks = jnp.dot(t_ref[:], kb, preferred_element_type=jnp.float32,
                         precision=prec)
            s_new = jnp.sqrt(sp_ref[:, sl]
                             / jnp.maximum(ks, EPS)) * bm_ref[:, sl]
            s_ref[:, sl] = s_new
            vb = jnp.dot((kb * s_new.astype(dtype)).T,
                         g_ref[:].astype(dtype),
                         preferred_element_type=jnp.float32, precision=prec)
            v_ref[sl, :] = vb
            nsk = jnp.sum(vb * vb, axis=0, keepdims=True)
            cok = jnp.dot(y_ref[:, sl], vb,
                          preferred_element_type=jnp.float32,
                          precision="highest")
            ns_acc = nsk if ns_acc is None else ns_acc + nsk
            co_acc = cok if co_acc is None else co_acc + cok

        @pl.when(j == 0)
        def _():
            ns_ref[:] = ns_acc
            co_ref[:] = co_acc

        @pl.when(j > 0)
        def _():
            ns_ref[:] += ns_acc
            co_ref[:] += co_acc
    return kernel


@functools.partial(jax.jit, static_argnames=("kernel_id", "tn"))
def finish_variant(fa, f_t, t, s_pre, bm, gr, y, na, nb,
                   kernel_id: str, tn: int):
    kernels = {
        "cur": ps._finish_colstats_kernel,
        "split2": _make_finish_split_kernel(2),
        "split4": _make_finish_split_kernel(4),
    }
    grid = (N_PAD // tn,)
    v, ns, co, s = pl.pallas_call(
        kernels[kernel_id],
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
        compiler_params=_params(),
    )(fa, f_t, t.astype(fa.dtype).reshape(1, P_PAD),
      s_pre.reshape(1, N_PAD), bm.reshape(1, N_PAD), gr,
      y.reshape(1, N_PAD), na.reshape(P_PAD, 1), nb.reshape(1, N_PAD))
    return v, ns[0], co[0], s[0]


def main():
    assert jax.default_backend() != "cpu", "run on the TPU"
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    f = rng.random((P_PAD, DP)).astype(np.float32) * 0.1
    f[:, D:] = 0.0
    ft = rng.random((DP, N_PAD)).astype(np.float32) * 0.1
    ft[D:, :] = 0.0
    fa = jnp.asarray(f, dtype)
    f_t = jnp.asarray(ft, dtype)
    # augmented layouts: fa' = [-2f, na, 1], f_t' = [f; 1; nb]
    na_np = np.sum(f * f, axis=1)
    nb_np = np.sum(ft * ft, axis=0)
    f_aug = np.concatenate(
        [-2.0 * f[:, :D], na_np[:, None], np.ones((P_PAD, 1), np.float32),
         np.zeros((P_PAD, DP - D - 2), np.float32)], axis=1)
    ft_aug = np.concatenate(
        [ft[:D], np.ones((1, N_PAD), np.float32), nb_np[None, :],
         np.zeros((DP - D - 2, N_PAD), np.float32)], axis=0)
    fa_aug = jnp.asarray(f_aug, dtype)
    f_t_aug = jnp.asarray(ft_aug, dtype)

    t2 = jnp.asarray(rng.random((2, P_PAD)), jnp.float32)
    bm = jnp.ones((N_PAD,), jnp.float32)
    t = jnp.asarray(rng.random(P_PAD), jnp.float32)
    s_pre = jnp.asarray(rng.random(N_PAD), jnp.float32)
    gr = jnp.asarray(rng.random((P_PAD, M_PAD)), jnp.float32)
    y = jnp.asarray(rng.random(N_PAD), jnp.float32)
    na = jnp.asarray(na_np)
    nb = jnp.asarray(nb_np)

    sync = jax.jit(jnp.sum)

    def wall(fn, *a, reps=5):
        float(sync(jax.tree.leaves(fn(*a))[0]))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(sync(jax.tree.leaves(fn(*a))[0]))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    RESULTS.parent.mkdir(parents=True, exist_ok=True)

    cases = []
    for tn in (1024, 2048):
        for kid in ("cross", "d2exp", "cur", "aug", "split2", "split4",
                    "aug_split2", "aug_split4"):
            use_aug = kid.startswith("aug")
            fai = fa_aug if use_aug else fa
            fti = f_t_aug if use_aug else f_t
            cases.append((f"ext2_{kid}", tn,
                          lambda fai=fai, fti=fti, kid=kid, tn=tn:
                          wall(ext2_variant, fai, fti, t2, bm, kid, tn)))
    for tn in (1024, 2048):
        for kid in ("cur", "split2", "split4"):
            cases.append((f"fin_{kid}", tn,
                          lambda kid=kid, tn=tn:
                          wall(finish_variant, fa, f_t, t, s_pre, bm, gr,
                               y, na, nb, kid, tn)))

    for name, tn, run in cases:
        try:
            w = run()
            rec = {"pass": name, "tn": tn, "wall_s": round(w, 4),
                   "ok": True, "ts": time.time()}
        except Exception as e:
            rec = {"pass": name, "tn": tn, "ok": False,
                   "err": str(e).split("\n")[0][:200], "ts": time.time()}
        with RESULTS.open("a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
