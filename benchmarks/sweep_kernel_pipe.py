"""Software-pipelined fused streaming kernels (VERDICT r4 #1, stage 2).

sweep_kernel_sched.py measured the fused ext2/finish bodies SERIAL: the
whole VPU chain (d2 + exp + consume) waits for the step's cross GEMM.
cur->aug showed removing 2 VPU ops/elem saves ~18 ms, i.e. MXU and VPU
do NOT overlap within a kernel body. These variants skew the phases by
one grid step through a double-buffered VMEM scratch:

    step j:  cross_j -> scratch[j%2]          (MXU)
             consume scratch[(j-1)%2]         (VPU + small dots)

so the scheduler sees two independent instruction streams per step. The
grid runs nt+1 steps; inputs consumed in the j-1 phase use index maps
clamped with jnp.maximum/minimum, and the extra first/last steps are
@pl.when-guarded.

Numerics: norms arrive PRECOMPUTED in f32 (na (p,1), nb (1,n)) exactly
like the production finish kernel — the sched sweep's augmented-GEMM
layout would carry them as bf16 GEMM inputs, which is unusable at real
NLM magnitudes (h=0.15 features give ||f||^2 ~ 3e2; bf16's 2^-9 relative
rounding is then an ABSOLUTE d2 error of ~1, a factor-e kernel error).
A small-shape correctness check against the plain-XLA f32 reference at
realistic magnitude runs first; walls only count if it passes.

    python benchmarks/sweep_kernel_pipe.py            # real TPU
Appends rows to benchmarks/results/kernel_sched.jsonl (pipe_* rows).
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
D = 25
DP = 32
M_PAD = 128
EPS = ps.FINISH_EPS


def _params():
    return pltpu.CompilerParams(vmem_limit_bytes=ps.VMEM_LIMIT_BYTES)


# --------------------------------------------------------------------------
# ext2, software-pipelined
# --------------------------------------------------------------------------

def _make_ext2_pipe_kernel(nt: int):
    def kernel(a_ref, b_ref, t2_ref, bm_ref, na_ref, nb_ref,
               u_ref, s_ref, c_ref):
        j = pl.program_id(0)
        dtype = a_ref.dtype
        prec = "default" if dtype == jnp.bfloat16 else "highest"

        @pl.when(j == 0)
        def _():
            u_ref[:] = jnp.zeros_like(u_ref)

        @pl.when(j < nt)
        def _():
            c_ref[j % 2] = jnp.dot(a_ref[:], b_ref[:],
                                   preferred_element_type=jnp.float32,
                                   precision=prec)

        @pl.when(j > 0)
        def _():
            cross = c_ref[(j - 1) % 2]
            d2 = jnp.maximum(na_ref[:] + nb_ref[:] - 2.0 * cross, 0.0)
            kb = (jnp.exp(-d2.astype(jnp.bfloat16))
                  if dtype == jnp.bfloat16 else jnp.exp(-d2))
            kbt = jnp.dot(t2_ref[:], kb, preferred_element_type=jnp.float32,
                          precision=prec)
            prod = jnp.maximum(kbt[0:1, :] * kbt[1:2, :], EPS)
            s = bm_ref[:] / jnp.sqrt(prod)
            s_ref[:] = s
            u_ref[:] += jnp.sum(kb.astype(jnp.float32) * s, axis=1,
                                keepdims=True)
    return kernel


@functools.partial(jax.jit, static_argnames=("tn", "n_pad"))
def ext2_pipe(fa, f_t, t2, bm, na, nb, tn: int, n_pad: int):
    nt = n_pad // tn
    last = nt - 1
    u, s = pl.pallas_call(
        _make_ext2_pipe_kernel(nt),
        grid=(nt + 1,),
        in_specs=[
            pl.BlockSpec((P_PAD, DP), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((DP, tn), lambda j: (0, jnp.minimum(j, last)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, P_PAD), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn),
                         lambda j: (0, jnp.maximum(j - 1, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P_PAD, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn),
                         lambda j: (0, jnp.maximum(j - 1, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((P_PAD, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn),
                         lambda j: (0, jnp.maximum(j - 1, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P_PAD, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, P_PAD, tn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * P_PAD * n_pad * (DP + 3),
            bytes_accessed=(P_PAD + n_pad) * DP * 2
            + 4 * (3 * P_PAD + 2 * n_pad),
            transcendentals=P_PAD * n_pad,
        ),
        compiler_params=_params(),
    )(fa, f_t, t2.astype(fa.dtype), bm.reshape(1, n_pad),
      na.reshape(P_PAD, 1), nb.reshape(1, n_pad))
    return u[:, 0], s[0]


# --------------------------------------------------------------------------
# finish, software-pipelined
# --------------------------------------------------------------------------

def _make_fin_pipe_kernel(nt: int):
    def kernel(a_ref, b_ref, t_ref, sp_ref, bm_ref, g_ref, y_ref,
               na_ref, nb_ref, v_ref, ns_ref, co_ref, s_ref, c_ref):
        j = pl.program_id(0)
        dtype = a_ref.dtype
        prec = "default" if dtype == jnp.bfloat16 else "highest"

        @pl.when(j == 0)
        def _():
            ns_ref[:] = jnp.zeros_like(ns_ref)
            co_ref[:] = jnp.zeros_like(co_ref)

        @pl.when(j < nt)
        def _():
            c_ref[j % 2] = jnp.dot(a_ref[:], b_ref[:],
                                   preferred_element_type=jnp.float32,
                                   precision=prec)

        @pl.when(j > 0)
        def _():
            cross = c_ref[(j - 1) % 2]
            d2 = jnp.maximum(na_ref[:] + nb_ref[:] - 2.0 * cross, 0.0)
            kb = jnp.exp(-d2).astype(dtype)          # f32 exp (colstats class)
            ks = jnp.dot(t_ref[:], kb, preferred_element_type=jnp.float32,
                         precision=prec)
            s_new = jnp.sqrt(sp_ref[:] / jnp.maximum(ks, EPS)) * bm_ref[:]
            s_ref[:] = s_new
            vb = jnp.dot((kb * s_new.astype(dtype)).T,
                         g_ref[:].astype(dtype),
                         preferred_element_type=jnp.float32, precision=prec)
            v_ref[:] = vb
            ns_ref[:] += jnp.sum(vb * vb, axis=0, keepdims=True)
            co_ref[:] += jnp.dot(y_ref[:], vb,
                                 preferred_element_type=jnp.float32,
                                 precision="highest")
    return kernel


@functools.partial(jax.jit, static_argnames=("tn", "n_pad"))
def fin_pipe(fa, f_t, t, s_pre, bm, gr, y, na, nb, tn: int, n_pad: int):
    nt = n_pad // tn
    last = nt - 1
    v, ns, co, s = pl.pallas_call(
        _make_fin_pipe_kernel(nt),
        grid=(nt + 1,),
        in_specs=[
            pl.BlockSpec((P_PAD, DP), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((DP, tn), lambda j: (0, jnp.minimum(j, last)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_PAD), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, jnp.maximum(j - 1, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, jnp.maximum(j - 1, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P_PAD, M_PAD), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, jnp.maximum(j - 1, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P_PAD, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, jnp.maximum(j - 1, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tn, M_PAD), lambda j: (jnp.maximum(j - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M_PAD), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M_PAD), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, jnp.maximum(j - 1, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, M_PAD), jnp.float32),
            jax.ShapeDtypeStruct((1, M_PAD), jnp.float32),
            jax.ShapeDtypeStruct((1, M_PAD), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, P_PAD, tn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * P_PAD * n_pad * (DP + M_PAD + 1),
            bytes_accessed=(P_PAD + n_pad) * DP * 2
            + 4 * n_pad * (M_PAD + 4) + 4 * P_PAD * (M_PAD + 2),
            transcendentals=P_PAD * n_pad,
        ),
        compiler_params=_params(),
    )(fa, f_t, t.astype(fa.dtype).reshape(1, P_PAD),
      s_pre.reshape(1, n_pad), bm.reshape(1, n_pad), gr,
      y.reshape(1, n_pad), na.reshape(P_PAD, 1), nb.reshape(1, n_pad))
    return v, ns[0], co[0], s[0]


# --------------------------------------------------------------------------
# references (production kernels) + data
# --------------------------------------------------------------------------

def _mkdata(rng, n_pad, scale):
    """Feature pairs at a controllable magnitude: scale ~2.2 reproduces
    real NLM-at-h=0.15 norms (||f||^2 ~ 1e2-3e2) where bf16-norm tricks
    break; 0.1 is the sched sweep's easy regime."""
    f = rng.random((P_PAD, DP)).astype(np.float32) * scale
    f[:, D:] = 0.0
    ft = rng.random((DP, n_pad)).astype(np.float32) * scale
    ft[D:, :] = 0.0
    na = np.sum(f * f, axis=1)
    nb = np.sum(ft * ft, axis=0)
    return f, ft, na, nb


def main():
    assert jax.default_backend() != "cpu", "run on the TPU"
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    RESULTS.parent.mkdir(parents=True, exist_ok=True)

    # ---- correctness at realistic magnitude, small shape ----------------
    n_small = 1 << 20
    f, ft, na_np, nb_np = _mkdata(rng, n_small, 2.2)
    fa = jnp.asarray(f, dtype)
    f_t = jnp.asarray(ft, dtype)
    na = jnp.asarray(na_np)
    nb = jnp.asarray(nb_np)
    t2 = jnp.asarray(rng.random((2, P_PAD)), jnp.float32)
    bm = jnp.ones((n_small,), jnp.float32)
    t = jnp.asarray(rng.random(P_PAD), jnp.float32)
    s_pre = jnp.asarray(rng.random(n_small), jnp.float32)
    gr = jnp.asarray(rng.random((P_PAD, M_PAD)), jnp.float32)
    y = jnp.asarray(rng.random(n_small), jnp.float32)

    u_ref, s_ref = ps.ext2_matvec_pallas(fa, f_t, t2, bm)
    u_p, s_p = ext2_pipe(fa, f_t, t2, bm, na, nb, 1024, n_small)
    # production computes na/nb in-kernel from the SAME bf16 tiles the
    # precomputed f32 norms here approximate from the f32 features — a
    # small systematic; the gate is agreement well under the bf16 noise
    du = float(jnp.max(jnp.abs(u_p - u_ref)) / jnp.max(jnp.abs(u_ref)))
    ds = float(jnp.max(jnp.abs(s_p - s_ref)) / jnp.max(jnp.abs(s_ref) + 1e-30))
    ok_ext2 = du < 0.05 and ds < 0.05

    v_r, ns_r, co_r, sf_r = ps.finish_colstats_pallas(
        fa, f_t, t, s_pre, bm, gr, y, na, nb)
    v_p, ns_p, co_p, sf_p = fin_pipe(fa, f_t, t, s_pre, bm, gr, y, na, nb,
                                     1024, n_small)
    dv = float(jnp.max(jnp.abs(v_p - v_r)))
    dns = float(jnp.max(jnp.abs(ns_p - ns_r) / (jnp.abs(ns_r) + 1e-30)))
    dsf = float(jnp.max(jnp.abs(sf_p - sf_r)))
    ok_fin = dv < 1e-4 and dns < 1e-4 and dsf < 1e-4

    rec = {"pass": "pipe_check", "ext2_rel_u": round(du, 6),
           "ext2_rel_s": round(ds, 6), "fin_max_dv": dv, "fin_rel_ns": dns,
           "fin_max_ds": dsf, "ok": bool(ok_ext2 and ok_fin),
           "ts": time.time()}
    with RESULTS.open("a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)

    # ---- walls at the 8 MP shape ----------------------------------------
    n_pad = 8 * 1024 * 1024
    f, ft, na_np, nb_np = _mkdata(rng, n_pad, 0.1)
    fa = jnp.asarray(f, dtype)
    f_t = jnp.asarray(ft, dtype)
    na = jnp.asarray(na_np)
    nb = jnp.asarray(nb_np)
    bm = jnp.ones((n_pad,), jnp.float32)
    s_pre = jnp.asarray(rng.random(n_pad), jnp.float32)
    y = jnp.asarray(rng.random(n_pad), jnp.float32)

    sync = jax.jit(jnp.sum)

    def wall(fn, *a, reps=5):
        float(sync(jax.tree.leaves(fn(*a))[0]))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(sync(jax.tree.leaves(fn(*a))[0]))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    cases = []
    for tn in (1024, 2048):
        cases.append((f"ext2_pipe", tn,
                      lambda tn=tn: wall(ext2_pipe, fa, f_t, t2, bm, na,
                                         nb, tn, n_pad)))
    for tn in (512, 1024):
        cases.append((f"fin_pipe", tn,
                      lambda tn=tn: wall(fin_pipe, fa, f_t, t, s_pre, bm,
                                         gr, y, na, nb, tn, n_pad)))

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
