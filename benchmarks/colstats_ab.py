"""A/B: XLA-scan colstats+V pass vs the fused Pallas kernel at 8 MP.

VERDICT r2 item 6 — the last profiled single-chip fusion headroom. The
colstats pass (ops/streaming.rmatmat_colstats_v) has ONE consumer for the
kernel tile, so XLA already fuses dist-GEMM -> exp -> dot without an HBM
round-trip; the hypothesis to test is whether the hand tiling
(ops/pallas_streaming.colstats_v_pallas) still wins on schedule quality.
Appends one JSON line per variant to benchmarks/results/profile.jsonl.

    python benchmarks/colstats_ab.py          # real TPU
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
    float(sync(fn(*args)))                      # compile + warm
    ws = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(sync(fn(*args)))
        ws.append(time.perf_counter() - t0)
    return min(ws)


def main():
    import graphlap_tpu  # noqa: F401  (pins matmul precision)
    from graphlap_tpu.ops import pallas_streaming as pst
    from graphlap_tpu.ops import streaming as st

    p, n_pad, d, m, block = 4096, 8_388_608, 27, 50, 65536
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    feats_a = jax.device_put(jnp.asarray(
        rng.normal(size=(p, d)).astype(np.float32)))
    feats_pad = jax.device_put(jnp.asarray(
        rng.normal(size=(n_pad, d)).astype(np.float32)))
    g = jax.device_put(jnp.asarray(rng.normal(size=(p, m)).astype(np.float32)))
    y = jax.device_put(jnp.asarray(rng.normal(size=(n_pad,)).astype(np.float32)))
    rs = jax.device_put(jnp.asarray(
        rng.uniform(0.5, 1.5, p).astype(np.float32)))
    cs = jax.device_put(jnp.asarray(
        rng.uniform(0.0, 1.5, n_pad).astype(np.float32)))

    xla = jax.jit(lambda fa, fp, gg, yy, r, c: st.rmatmat_colstats_v(
        fa, fp, gg, yy, r, c, block, dtype))
    w_xla = wall(xla, feats_a, feats_pad, g, y, rs, cs)

    tp, p_pad = pst.p_tiling(p)
    fa_pad = jax.device_put(jnp.zeros((p_pad, pst.D_PAD), dtype)
                            .at[:p, :d].set(feats_a.astype(dtype)))
    f_t = jax.device_put(jnp.zeros((pst.D_PAD, n_pad), dtype)
                         .at[:d, :].set(feats_pad.astype(dtype).T))
    gr = jax.device_put(jnp.zeros((p_pad, pst.M_PAD), jnp.float32)
                        .at[:p, :m].set(g * rs[:, None]))
    na = jax.device_put(jnp.zeros(p_pad, jnp.float32)
                        .at[:p].set(jnp.sum(feats_a * feats_a, axis=1)))
    nb = jax.device_put(jnp.sum(feats_pad * feats_pad, axis=1))
    # the 8 MP shape cannot hold both variants' V buffers at once — free
    # the XLA-path feature rows before the Pallas wall
    del feats_pad
    w_pal = wall(pst.colstats_v_pallas, fa_pad, f_t, gr, y, cs, na, nb)

    # sanity at a smaller slice (full-shape correctness: the unit test
    # tests/test_pallas.py::test_colstats_v_pallas_matches_xla)
    ns_ = 1 << 20
    fps = jax.device_put(jnp.asarray(
        np.random.default_rng(1).normal(size=(ns_, d)).astype(np.float32)))
    nx, cx, vx = xla(feats_a, fps, g, y[:ns_], rs, cs[:ns_])
    fts = jnp.zeros((pst.D_PAD, ns_), dtype).at[:d, :].set(
        fps.astype(dtype).T)
    nbs = jnp.sum(fps * fps, axis=1)
    vp, np_, cp = pst.colstats_v_pallas(fa_pad, fts, gr, y[:ns_], cs[:ns_],
                                        na, nbs)
    vdiff = float(jnp.abs(vp[:ns_, :m] - vx).max())

    rec = {"op": "colstats_ab_8mp", "p": p, "n_pad": n_pad, "m": m,
           "dtype": "bfloat16", "block": block,
           "xla_scan_s": round(w_xla, 4), "pallas_fused_s": round(w_pal, 4),
           "speedup": round(w_xla / w_pal, 3), "v_maxdiff": vdiff,
           "ts": time.time()}
    RESULTS.parent.mkdir(parents=True, exist_ok=True)
    with RESULTS.open("a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
