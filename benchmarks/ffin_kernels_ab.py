"""Per-kernel walls of the fused-finish passes vs their unfused
counterparts at the cfg4 shape (8 MP, p=4096, bf16, d=27 NLM).

    python benchmarks/ffin_kernels_ab.py            # all ops, one process
    python benchmarks/ffin_kernels_ab.py <op> ...   # only the named ops

Prints one JSON line; appends to benchmarks/results/profile.jsonl. The
per-op mode exists because this box's remote-compile endpoint drops the
pipe on long compile sessions (two full-run attempts died mid-compile):
run one op per process and a broken pipe costs one op, and the
persistent compile cache makes the retry warm.
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

RESULTS = Path(__file__).parent / "results" / "profile.jsonl"


def wall(fn, *args, reps=3):
    sync = jax.jit(lambda t: jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(x), t, 0.0))
    float(sync(fn(*args)))
    ws = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(sync(fn(*args)))
        ws.append(time.perf_counter() - t0)
    return min(ws)


def main():
    import graphlap_tpu  # noqa: F401
    from graphlap_tpu.ops import pallas_streaming as pst
    from graphlap_tpu.ops import streaming as st

    p, n_pad, d, m, block = 4096, 8_388_608, 27, 50, 65536
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    feats_a = jax.device_put(jnp.asarray(
        rng.normal(0, 0.3, size=(p, d)).astype(np.float32)))
    feats_pad = jax.device_put(jnp.asarray(
        rng.normal(0, 0.3, size=(n_pad, d)).astype(np.float32)))
    t2 = jax.device_put(jnp.asarray(
        rng.uniform(0.5, 1.5, (p, 2)).astype(np.float32)))
    t1 = t2[:, 0]
    b_mask = jax.device_put(jnp.ones(n_pad, jnp.float32))
    s1 = jax.device_put(jnp.asarray(
        rng.uniform(0.1, 1.0, n_pad).astype(np.float32)))
    g = jax.device_put(jnp.asarray(
        rng.normal(size=(p, m)).astype(np.float32)))
    y = jax.device_put(jnp.asarray(
        rng.normal(size=(n_pad,)).astype(np.float32)))
    ones_p = jnp.ones(p, jnp.float32)

    dp = pst.d_pad_of(d)
    tn = pst._tile_n(dtype)
    n_k = -(-n_pad // tn) * tn
    _, p_pad = pst.p_tiling(p)
    fa_pad = jax.device_put(jnp.zeros((p_pad, dp), dtype)
                            .at[:p, :d].set(feats_a.astype(dtype)))
    f_t = jax.device_put(jnp.zeros((dp, n_k), dtype)
                         .at[:d, :n_pad].set(feats_pad.astype(dtype).T))
    gr = jax.device_put(jnp.zeros((p_pad, pst.M_PAD), jnp.float32)
                        .at[:p, :m].set(g))
    na = jax.device_put(jnp.zeros(p_pad, jnp.float32)
                        .at[:p].set(jnp.sum(feats_a * feats_a, axis=1)))
    nb = jax.device_put(jnp.zeros(n_k, jnp.float32)
                        .at[:n_pad].set(jnp.sum(feats_pad * feats_pad,
                                                axis=1)))
    t2p = jnp.zeros((2, p_pad), jnp.float32).at[:, :p].set(t2.T)
    t1p = jnp.zeros(p_pad, jnp.float32).at[:p].set(t1)

    # NOTE: the XLA thunks must take the big arrays as jit ARGUMENTS —
    # a nullary jit(lambda: ...) closure bakes the 900 MB feats_pad into
    # the HLO as a literal, and shipping that program to this box's
    # remote-compile endpoint breaks the pipe (three observed failures).
    thunks = {
        "rmatvec2_xla": lambda: wall(
            jax.jit(lambda fa, fp, t, bm: st.rmatvec2(fa, fp, t, bm,
                                                      block, dtype)),
            feats_a, feats_pad, t2, b_mask),
        "matvec_pallas": lambda: wall(
            lambda: pst.matvec_pallas(fa_pad, f_t, jnp.zeros(n_k)
                                      .at[:n_pad].set(s1))),
        "rmatvec_pallas": lambda: wall(
            lambda: pst.rmatvec_pallas(fa_pad, f_t, t1p)),
        "ext2_matvec_pallas": lambda: wall(
            lambda: pst.ext2_matvec_pallas(fa_pad, f_t, t2p,
                                           jnp.zeros(n_k).at[:n_pad]
                                           .set(b_mask))),
        "colstats_v_xla": lambda: wall(
            jax.jit(lambda fa, fp, gg, yy, op, ss: st.rmatmat_colstats_v(
                fa, fp, gg, yy, op, ss, block, dtype)),
            feats_a, feats_pad, g, y, ones_p, s1),
        "finish_colstats_pallas": lambda: wall(
            lambda: pst.finish_colstats_pallas(
                fa_pad, f_t, t1p, jnp.zeros(n_k).at[:n_pad].set(s1),
                jnp.zeros(n_k).at[:n_pad].set(b_mask), gr,
                jnp.zeros(n_k).at[:n_pad].set(y), na, nb)),
        # tuning variants: 64-wide eigvec pad (m=50 fits; half the V GEMM
        # + V traffic) and wider column tiles (fewer grid steps)
        "finish_m64": lambda: wall(
            lambda: pst.finish_colstats_pallas(
                fa_pad, f_t, t1p, jnp.zeros(n_k).at[:n_pad].set(s1),
                jnp.zeros(n_k).at[:n_pad].set(b_mask), gr[:, :64],
                jnp.zeros(n_k).at[:n_pad].set(y), na, nb)),
        "finish_m64_tn512": lambda: wall(
            lambda: pst.finish_colstats_pallas(
                fa_pad, f_t, t1p, jnp.zeros(n_k).at[:n_pad].set(s1),
                jnp.zeros(n_k).at[:n_pad].set(b_mask), gr[:, :64],
                jnp.zeros(n_k).at[:n_pad].set(y), na, nb, tn=512)),
        "finish_m128_tn512": lambda: wall(
            lambda: pst.finish_colstats_pallas(
                fa_pad, f_t, t1p, jnp.zeros(n_k).at[:n_pad].set(s1),
                jnp.zeros(n_k).at[:n_pad].set(b_mask), gr,
                jnp.zeros(n_k).at[:n_pad].set(y), na, nb, tn=512)),
        "ext2_tn512": lambda: wall(
            lambda: pst.ext2_matvec_pallas(fa_pad, f_t, t2p,
                                           jnp.zeros(n_k).at[:n_pad]
                                           .set(b_mask), tn=512)),
        "ext2_tn2048": lambda: wall(
            lambda: pst.ext2_matvec_pallas(fa_pad, f_t, t2p,
                                           jnp.zeros(n_k).at[:n_pad]
                                           .set(b_mask), tn=2048)),
    }
    import sys
    names = sys.argv[1:] or list(thunks)
    rows = {name: thunks[name]() for name in names}

    rec = {"op_walls_8mp_ffin": {k: round(v, 4) for k, v in rows.items()},
           "device": str(jax.devices()[0]), "ts": time.time()}
    with RESULTS.open("a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
