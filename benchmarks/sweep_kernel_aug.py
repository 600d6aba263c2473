"""Split-norm augmented-GEMM kernels (VERDICT r4 #1, stage 3).

sweep_kernel_sched.py: the aug layout (d2 straight from the MXU
accumulator) buys ~18 ms/sweep at 8 MP, but bf16-rounded norms are an
ABSOLUTE d2 error of ~0.002*||f||^2 — a factor-e kernel error at real
NLM magnitudes (||f||^2 ~ 3e2 at h=0.15). sweep_kernel_pipe.py: the
software-pipelined variants are a measured NEGATIVE (ext2 0.16 vs 0.12,
fin 0.19 vs 0.135 — the scratch round-trip costs more than any overlap).

This sweep measures the numerically-safe version: norms ride the GEMM
as COMPENSATED bf16 SPLITS (three lanes, residue ~2^-24 ||f||^2 —
re-quantizes to the identical bf16 tile; free at d=25 since d+6=31
still pads to dp=32). REGRESSION HISTORY (r5): the measured
0.65-0.88 dB quality loss at 8 MP was NOT the split residue — XLA:TPU's
excess-precision simplifier elided the f32->bf16->f32 round-trips
inside the fused jit, computing norms from UNROUNDED features and
zeroing the compensation lanes entirely (which is why 2- and 3-lane
splits measured bit-identically wrong). Fixed with
lax.optimization_barrier around every rounding in the production
aug_pads (ops/pallas_streaming.py); this sweep's numpy emulation was
never affected. Layout (d = 25, dp = 32 unchanged):

    fa' = [-2f_r, na_hi, na_mid, na_lo, 1, 1, 1, 0...]   (p, dp)
    ft' = [ f_r,  1, 1, 1, nb_hi, nb_mid, nb_lo, 0...]   (dp, n)

Variants: ext2_aug2, fin_aug2, matvec_aug2 — correctness vs the
production kernels at realistic magnitude first (norms of the ROUNDED
features, matching _kb_tile's in-kernel norms), then 8 MP walls.

    python benchmarks/sweep_kernel_aug.py            # real TPU
Appends rows to benchmarks/results/kernel_sched.jsonl (aug2_* rows).
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


def _kb_tile_aug2(a_ref, b_ref, dtype):
    d2 = jnp.maximum(
        jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32,
                precision="default"), 0.0)
    if dtype == jnp.bfloat16:
        return jnp.exp(-d2).astype(jnp.bfloat16)   # f32 exp: d2 is f32-exact
    return jnp.exp(-d2)


def _ext2_aug2_kernel(a_ref, b_ref, t2_ref, bm_ref, u_ref, s_ref):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        u_ref[:] = jnp.zeros_like(u_ref)

    dtype = a_ref.dtype
    prec = "default" if dtype == jnp.bfloat16 else "highest"
    kb = _kb_tile_aug2(a_ref, b_ref, dtype)
    kbt = jnp.dot(t2_ref[:], kb, preferred_element_type=jnp.float32,
                  precision=prec)
    prod = jnp.maximum(kbt[0:1, :] * kbt[1:2, :], EPS)
    s = bm_ref[:] / jnp.sqrt(prod)
    s_ref[:] = s
    u_ref[:] += jnp.sum(kb.astype(jnp.float32) * s, axis=1, keepdims=True)


def _fin_aug2_kernel(a_ref, b_ref, t_ref, sp_ref, bm_ref, g_ref, y_ref,
                     v_ref, ns_ref, co_ref, s_ref):
    j = pl.program_id(0)
    dtype = a_ref.dtype
    prec = "default" if dtype == jnp.bfloat16 else "highest"
    d2 = jnp.maximum(
        jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32,
                precision=prec), 0.0)
    kb = jnp.exp(-d2).astype(dtype)                # f32 exp (colstats class)
    ks = jnp.dot(t_ref[:], kb, preferred_element_type=jnp.float32,
                 precision=prec)
    s_new = jnp.sqrt(sp_ref[:] / jnp.maximum(ks, EPS)) * bm_ref[:]
    s_ref[:] = s_new
    vb = jnp.dot((kb * s_new.astype(dtype)).T, g_ref[:].astype(dtype),
                 preferred_element_type=jnp.float32, precision=prec)
    v_ref[:] = vb
    ns = jnp.sum(vb * vb, axis=0, keepdims=True)
    co = jnp.dot(y_ref[:], vb, preferred_element_type=jnp.float32,
                 precision="highest")

    @pl.when(j == 0)
    def _():
        ns_ref[:] = ns
        co_ref[:] = co

    @pl.when(j > 0)
    def _():
        ns_ref[:] += ns
        co_ref[:] += co


def _matvec_aug2_kernel(a_ref, b_ref, v_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    kb = _kb_tile_aug2(a_ref, b_ref, a_ref.dtype)
    out_ref[:] += jnp.sum(kb.astype(jnp.float32) * v_ref[:], axis=1,
                          keepdims=True)


@functools.partial(jax.jit, static_argnames=("tn", "n_pad"))
def ext2_aug2(fa, f_t, t2, bm, tn: int, n_pad: int):
    u, s = pl.pallas_call(
        _ext2_aug2_kernel,
        grid=(n_pad // tn,),
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
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * P_PAD * n_pad * (DP + 3),
            bytes_accessed=(P_PAD + n_pad) * DP * 2
            + 4 * (3 * P_PAD + 2 * n_pad),
            transcendentals=P_PAD * n_pad,
        ),
        compiler_params=_params(),
    )(fa, f_t, t2.astype(fa.dtype), bm.reshape(1, n_pad))
    return u[:, 0], s[0]


@functools.partial(jax.jit, static_argnames=("tn", "n_pad"))
def fin_aug2(fa, f_t, t, s_pre, bm, gr, y, tn: int, n_pad: int):
    v, ns, co, s = pl.pallas_call(
        _fin_aug2_kernel,
        grid=(n_pad // tn,),
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
            jax.ShapeDtypeStruct((n_pad, M_PAD), jnp.float32),
            jax.ShapeDtypeStruct((1, M_PAD), jnp.float32),
            jax.ShapeDtypeStruct((1, M_PAD), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * P_PAD * n_pad * (DP + M_PAD + 1),
            bytes_accessed=(P_PAD + n_pad) * DP * 2
            + 4 * n_pad * (M_PAD + 4) + 4 * P_PAD * (M_PAD + 2),
            transcendentals=P_PAD * n_pad,
        ),
        compiler_params=_params(),
    )(fa, f_t, t.astype(fa.dtype).reshape(1, P_PAD),
      s_pre.reshape(1, n_pad), bm.reshape(1, n_pad), gr,
      y.reshape(1, n_pad))
    return v, ns[0], co[0], s[0]


@functools.partial(jax.jit, static_argnames=("tn", "n_pad"))
def matvec_aug2(fa, f_t, v, tn: int, n_pad: int):
    out = pl.pallas_call(
        _matvec_aug2_kernel,
        grid=(1, n_pad // tn),
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
            flops=2 * P_PAD * n_pad * (DP + 1),
            bytes_accessed=(P_PAD + n_pad) * DP * 2 + 4 * (P_PAD + n_pad),
            transcendentals=P_PAD * n_pad,
        ),
        compiler_params=_params(),
    )(fa, f_t, v.reshape(1, n_pad))
    return out[:, 0]


# --------------------------------------------------------------------------

def _split_bf16(x: np.ndarray, lanes: int = 3) -> list[np.ndarray]:
    """``lanes``-term compensated bf16 split. Production
    (ops/pallas_streaming.aug_pads) uses THREE lanes, whose residue
    (~2^-24 ||f||^2) re-quantizes to the identical bf16 kernel tile.
    (The r5 0.65-0.88 dB regression was XLA eliding the roundings under
    jit, not the lane count — module docstring.)"""
    import ml_dtypes
    outs = []
    r = x.astype(np.float64)
    for _ in range(lanes):
        h = r.astype(ml_dtypes.bfloat16).astype(np.float64)
        outs.append(h.astype(np.float32))
        r = r - h
    return outs


def _augment(f: np.ndarray, ft: np.ndarray):
    """(fa_aug (P,DP), ft_aug (DP,n)) f32 — cast to tile dtype by caller.
    Norms computed from the ROUNDED features (the kernels' in-tile norms
    are sums of exact bf16-product squares — same values)."""
    import ml_dtypes
    fr = f[:, :D].astype(ml_dtypes.bfloat16).astype(np.float32)
    ftr = ft[:D].astype(ml_dtypes.bfloat16).astype(np.float32)
    na = np.sum(fr * fr, axis=1)
    nb = np.sum(ftr * ftr, axis=0)
    nas = _split_bf16(na)
    nbs = _split_bf16(nb)
    k = len(nas)
    p, n = f.shape[0], ft.shape[1]
    fa_aug = np.zeros((p, DP), np.float32)
    fa_aug[:, :D] = -2.0 * fr
    for i, lane in enumerate(nas):
        fa_aug[:, D + i] = lane
    fa_aug[:, D + k:D + 2 * k] = 1.0
    ft_aug = np.zeros((DP, n), np.float32)
    ft_aug[:D] = ftr
    ft_aug[D:D + k] = 1.0
    for i, lane in enumerate(nbs):
        ft_aug[D + k + i] = lane
    return fa_aug, ft_aug


def _mkdata(rng, n_pad, scale):
    f = rng.random((P_PAD, DP)).astype(np.float32) * scale
    f[:, D:] = 0.0
    ft = rng.random((DP, n_pad)).astype(np.float32) * scale
    ft[D:, :] = 0.0
    return f, ft


def main():
    assert jax.default_backend() != "cpu", "run on the TPU"
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    RESULTS.parent.mkdir(parents=True, exist_ok=True)

    # ---- correctness at realistic magnitude, small shape ----------------
    n_small = 1 << 20
    f, ft = _mkdata(rng, n_small, 2.2)
    fa = jnp.asarray(f, dtype)
    f_t = jnp.asarray(ft, dtype)
    f_aug_np, ft_aug_np = _augment(f, ft)
    fa_aug = jnp.asarray(f_aug_np, dtype)
    ft_aug = jnp.asarray(ft_aug_np, dtype)
    t2 = jnp.asarray(rng.random((2, P_PAD)), jnp.float32)
    bm = jnp.ones((n_small,), jnp.float32)
    t = jnp.asarray(rng.random(P_PAD), jnp.float32)
    s_pre = jnp.asarray(rng.random(n_small), jnp.float32)
    gr = jnp.asarray(rng.random((P_PAD, M_PAD)), jnp.float32)
    y = jnp.asarray(rng.random(n_small), jnp.float32)
    import ml_dtypes
    na = jnp.asarray(np.sum(f[:, :D].astype(ml_dtypes.bfloat16)
                            .astype(np.float32) ** 2, axis=1))
    nb = jnp.asarray(np.sum(ft[:D].astype(ml_dtypes.bfloat16)
                            .astype(np.float32) ** 2, axis=0))

    u_ref, s_ref = ps.ext2_matvec_pallas(fa, f_t, t2, bm)
    u_a, s_a = ext2_aug2(fa_aug, ft_aug, t2, bm, 1024, n_small)
    du = float(jnp.max(jnp.abs(u_a - u_ref)) / jnp.max(jnp.abs(u_ref)))
    ds = float(jnp.max(jnp.abs(s_a - s_ref))
               / jnp.max(jnp.abs(s_ref) + 1e-30))

    v_r, ns_r, co_r, sf_r = ps.finish_colstats_pallas(
        fa, f_t, t, s_pre, bm, gr, y, na, nb)
    v_a, ns_a, co_a, sf_a = fin_aug2(fa_aug, ft_aug, t, s_pre, bm, gr, y,
                                     1024, n_small)
    dv = float(jnp.max(jnp.abs(v_a - v_r)))
    dns = float(jnp.max(jnp.abs(ns_a - ns_r) / (jnp.abs(ns_r) + 1e-30)))

    mv_ref = ps.matvec_pallas(fa, f_t, jnp.asarray(
        rng.random(n_small), jnp.float32))
    # recompute with the same v for both
    vvec = jnp.asarray(rng.random(n_small), jnp.float32)
    mv_ref = ps.matvec_pallas(fa, f_t, vvec)
    mv_a = matvec_aug2(fa_aug, ft_aug, vvec, 1024, n_small)
    dmv = float(jnp.max(jnp.abs(mv_a - mv_ref)) / jnp.max(jnp.abs(mv_ref)))

    rec = {"pass": "aug2_check", "ext2_rel_u": round(du, 6),
           "ext2_rel_s": round(ds, 6), "fin_max_dv": round(dv, 8),
           "fin_rel_ns": round(dns, 8), "matvec_rel": round(dmv, 6),
           "ok": bool(du < 0.02 and ds < 0.02 and dv < 0.01
                      and dmv < 0.02),
           "ts": time.time()}
    with RESULTS.open("a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)

    # ---- walls at the 8 MP shape ----------------------------------------
    n_pad = 8 * 1024 * 1024
    f, ft = _mkdata(rng, n_pad, 0.1)
    f_aug_np, ft_aug_np = _augment(f, ft)
    fa_aug = jnp.asarray(f_aug_np, dtype)
    ft_aug = jnp.asarray(ft_aug_np, dtype)
    bm = jnp.ones((n_pad,), jnp.float32)
    s_pre = jnp.asarray(rng.random(n_pad), jnp.float32)
    y = jnp.asarray(rng.random(n_pad), jnp.float32)
    vvec = jnp.asarray(rng.random(n_pad), jnp.float32)

    sync = jax.jit(jnp.sum)

    def wall(fn, *a, reps=5):
        float(sync(jax.tree.leaves(fn(*a))[0]))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(sync(jax.tree.leaves(fn(*a))[0]))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    cases = [
        ("ext2_aug2", 1024,
         lambda: wall(ext2_aug2, fa_aug, ft_aug, t2, bm, 1024, n_pad)),
        ("ext2_aug2", 2048,
         lambda: wall(ext2_aug2, fa_aug, ft_aug, t2, bm, 2048, n_pad)),
        ("fin_aug2", 1024,
         lambda: wall(fin_aug2, fa_aug, ft_aug, t, s_pre, bm, gr, y,
                      1024, n_pad)),
        ("fin_aug2", 2048,
         lambda: wall(fin_aug2, fa_aug, ft_aug, t, s_pre, bm, gr, y,
                      2048, n_pad)),
        ("matvec_aug2", 2048,
         lambda: wall(matvec_aug2, fa_aug, ft_aug, vvec, 2048, n_pad)),
        ("matvec_aug2", 4096,
         lambda: wall(matvec_aug2, fa_aug, ft_aug, vvec, 4096, n_pad)),
    ]
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
