"""A/B: streaming-kernel feature width 32 vs 128 at the cfg4 shapes.

The fused kernels accept any 32-multiple feature pad (ops/pallas_streaming
``d_pad_of``); production now builds dp=32 for NLM 5x5 (d=25) instead of
one full 128-lane MXU block. This measures what that buys per pass on the
real chip at 8 MP: the transposed feature copy drops 2.1 -> 0.54 GB bf16
(the capacity-row enabler), HBM feature traffic drops 4x, and the MXU
cross-GEMM runs K=32 instead of a zero-padded K=128.

    python benchmarks/ab_dpad.py [--dtype bfloat16] [--hw 2048 4096]

Appends rows to benchmarks/results/ab_dpad.jsonl.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax

from graphlap_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache(Path(__file__).parent.parent)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np

RESULTS = Path(__file__).parent / "results" / "ab_dpad.jsonl"


def _time(fn, *args, n=5):
    """Per-call wall via a host-fetched scalar: float(sum(out)) forces
    the device work to really finish — block_until_ready alone measured
    25 us for an 8 MP pass on this remote-tunnel backend (physically
    impossible: the pass reads 0.5+ GB of HBM), so it does not await
    remote completion for these kernels. The sum is jitted TOGETHER with
    the op (one dispatch; eager per-op dispatch costs seconds here) and
    the scalar fetch is the completion fence on both A/B legs alike."""
    import jax.numpy as jnp

    @jax.jit
    def timed(*a):
        out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        return out, sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

    out, s = timed(*args)
    float(s)
    walls = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(timed(*args)[1])
        walls.append(time.perf_counter() - t0)
    return min(walls), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16",
                    choices=("float32", "bfloat16"))
    ap.add_argument("--hw", type=int, nargs=2, default=(2048, 4096))
    ap.add_argument("--p", type=int, default=4096)
    ap.add_argument("--m", type=int, default=50)
    args = ap.parse_args()

    import jax.numpy as jnp
    import graphlap_tpu  # noqa: F401  (pins matmul precision)
    from graphlap_tpu.ops import pallas_streaming as pst

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    h, w = args.hw
    n = h * w
    p, d, m = args.p, 25, args.m
    _, p_pad = pst.p_tiling(p)
    tn = pst._tile_n(dtype)
    n_pad = -(-n // tn) * tn
    n_pad = -(-n_pad // pst.EMIT_TN) * pst.EMIT_TN

    rng = np.random.default_rng(0)
    feats = rng.normal(0, 0.1, size=(n_pad, d)).astype(np.float32)
    feats_a = feats[:p]
    v = jnp.asarray(rng.normal(size=(n_pad,)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(p_pad,)).astype(np.float32))
    gr = jnp.asarray(rng.normal(size=(p_pad, pst.M_PAD)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(n_pad,)).astype(np.float32))
    cs = jnp.asarray(rng.uniform(0.5, 1.5, n_pad).astype(np.float32))
    na = jnp.asarray((feats_a ** 2).sum(1))
    na = jnp.zeros(p_pad, jnp.float32).at[:p].set(na[:p])
    nb = jnp.asarray((feats ** 2).sum(1))

    rec = {"backend": jax.default_backend(), "device": str(jax.devices()[0]),
           "n": n, "p": p, "dtype": args.dtype, "ts": time.time()}
    outs = {}
    for dp in (32, 128):
        fa = (jnp.zeros((p_pad, dp), dtype)
              .at[:p, :d].set(jnp.asarray(feats_a, dtype)))
        ft = (jnp.zeros((dp, n_pad), dtype)
              .at[:d, :].set(jnp.asarray(feats, dtype).T))
        jax.block_until_ready((fa, ft))
        w_mv, o_mv = _time(pst.matvec_pallas, fa, ft, v)
        w_rmv, o_rmv = _time(pst.rmatvec_pallas, fa, ft, t)
        w_cs, o_cs = _time(pst.colstats_v_pallas, fa, ft, gr, y, cs, na, nb)
        rec[f"matvec_s_dp{dp}"] = round(w_mv, 6)
        rec[f"rmatvec_s_dp{dp}"] = round(w_rmv, 6)
        rec[f"colstats_s_dp{dp}"] = round(w_cs, 6)
        outs[dp] = (np.asarray(o_mv), np.asarray(o_rmv),
                    np.asarray(o_cs[0]))
        del fa, ft

    for i, name in enumerate(("matvec", "rmatvec", "colstats_v")):
        diff = float(np.abs(outs[32][i] - outs[128][i]).max())
        rec[f"maxdiff_{name}"] = diff
    for op in ("matvec", "rmatvec", "colstats"):
        rec[f"speedup_{op}"] = round(
            rec[f"{op}_s_dp128"] / max(rec[f"{op}_s_dp32"], 1e-9), 3)

    RESULTS.parent.mkdir(parents=True, exist_ok=True)
    with RESULTS.open("a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
