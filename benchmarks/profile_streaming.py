"""Per-operator device profile of the cfg4 streaming pipeline (8 MP).

Times each full-N streaming pass and the p-sized solves in isolation at the
exact cfg4 shapes, so kernel work targets the measured bottleneck instead of
the assumed one. Run on the real TPU:

    python benchmarks/profile_streaming.py [--dtype bfloat16] [--block 131072]

Appends rows to benchmarks/results/profile.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from pathlib import Path

# jax is pre-imported at interpreter startup on this box (a .pth
# hook), so JAX_* env mutations here are no-ops — only the config
# API takes effect (same trap as JAX_PLATFORMS; CLAUDE.md)
import jax

from graphlap_tpu.utils.cache import setup_compilation_cache
setup_compilation_cache(Path(__file__).parent.parent)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np

RESULTS = Path(__file__).parent / "results" / "profile.jsonl"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16",
                    choices=("float32", "bfloat16"))
    ap.add_argument("--block", type=int, default=131072)
    ap.add_argument("--hw", type=int, nargs=2, default=(2048, 4096))
    ap.add_argument("--coarse", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        setup_compilation_cache(Path(__file__).parent.parent, cpu=True)

    import jax
    import jax.numpy as jnp
    import graphlap_tpu as gl
    from graphlap_tpu.models.pipeline import make_plan
    from graphlap_tpu.ops import streaming as st
    from graphlap_tpu.ops.affinity import affinity_strip, extract_features
    from graphlap_tpu.ops.nystrom import nystrom_chol_factor

    h, w = args.hw
    cfg = gl.PipelineConfig(
        kernel="nlm", h=0.25, sample_rho=0.01, sample_cap=4096,
        num_eigvecs=50, sinkhorn_iters=10, streaming=True,
        block_cols=args.block, affinity_dtype=args.dtype,
        sinkhorn_coarse=args.coarse)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    img = gl.make_test_image(h, w)
    plan = make_plan(img, cfg)
    n, p, m = h * w, plan.p, cfg.num_eigvecs
    block = cfg.block_cols
    n_pad = -(-n // block) * block

    feats = jax.jit(lambda im: extract_features(im, cfg))(jnp.asarray(img))
    feats_a = jnp.take(feats, jnp.asarray(plan.idx_a), axis=0)
    d = feats.shape[1]
    feats_pad = jnp.zeros((n_pad, d), jnp.float32).at[:n].set(feats)
    rng = np.random.default_rng(0)
    ones_p = jnp.ones(p, jnp.float32)
    v = jnp.asarray(rng.random(n_pad), jnp.float32)
    t = jnp.asarray(rng.random(p), jnp.float32)
    t2 = jnp.asarray(rng.random((p, 2)), jnp.float32)
    g = jnp.asarray(rng.random((p, m)), jnp.float32)
    wv = jnp.asarray(rng.random(m), jnp.float32)
    y = v

    kaa = jax.jit(lambda a: affinity_strip(a, a, dtype))(feats_a)
    cross = jnp.asarray(rng.random((p, p)), jnp.float32)
    cross = cross @ cross.T * 1e-3

    sync = jax.jit(jnp.sum)

    def wall(fn, *a, reps=3):
        f = jax.jit(fn)
        float(sync(jax.tree.leaves(f(*a))[0]))      # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(sync(jax.tree.leaves(f(*a))[0]))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    rows = {}
    rows["features_8mp"] = wall(lambda im: extract_features(im, cfg),
                                jnp.asarray(img))
    rows["matvec"] = wall(
        lambda fa, f, vv: st.matvec(fa, f, vv, ones_p, jnp.ones_like(vv),
                                    block, dtype), feats_a, feats_pad, v)
    rows["rmatvec"] = wall(
        lambda fa, f, tt: st.rmatvec(fa, f, tt, ones_p,
                                     jnp.ones_like(f[:, 0]), block, dtype),
        feats_a, feats_pad, t)
    rows["rmatvec2"] = wall(
        lambda fa, f, tt: st.rmatvec2(fa, f, tt, jnp.ones_like(f[:, 0]),
                                      block, dtype),
        feats_a, feats_pad, t2)
    rows["gram"] = wall(
        lambda fa, f, sa, c: st.gram(fa, f, sa, c, block, dtype),
        feats_a, feats_pad, ones_p, v)
    rows["colstats"] = wall(
        lambda fa, f, gg, yy, sa, c: st.rmatmat_colstats(
            fa, f, gg, yy, sa, c, block, dtype),
        feats_a, feats_pad, g, y, ones_p, v)
    rows["apply"] = wall(
        lambda fa, f, gg, ww, sa, c: st.rmat_apply(
            fa, f, gg, ww, sa, c, block, dtype),
        feats_a, feats_pad, g, wv, ones_p, v)

    # coarse Sinkhorn: one decimated contraction step at k
    k = args.coarse
    feats_c = feats_pad[::k]
    mask_c = jnp.ones(feats_c.shape[0], jnp.float32)
    rows[f"sinkhorn_coarse_step_k{k}"] = wall(
        lambda fa, fc, tt, mc: st.sinkhorn_coarse_step(
            fa, fc, tt, mc, 1.0, block // k, dtype),
        feats_a, feats_c, t, mask_c)

    rows["chol_lobpcg_p"] = wall(
        lambda a, c: nystrom_chol_factor(a, c, m, cfg.eig_tol, "lobpcg",
                                         cfg.lobpcg_iters),
        kaa.astype(jnp.float32), cross)
    rows["eigh_p"] = wall(lambda a: jnp.linalg.eigh(a), cross)

    rec = {"shape": [h, w], "p": p, "m": m, "d": int(d), "block": block,
           "dtype": args.dtype, "backend": jax.default_backend(),
           "walls_s": {k2: round(v2, 4) for k2, v2 in rows.items()},
           "ts": time.time()}
    RESULTS.parent.mkdir(parents=True, exist_ok=True)
    with RESULTS.open("a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec, indent=2))


if __name__ == "__main__":
    main()
