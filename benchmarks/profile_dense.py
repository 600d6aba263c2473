"""Per-operator device profile of the cfg2 DENSE pipeline (512^2, p=5243).

The fused device wall is 0.29 s but the staged walls (which each pay a
tunnel dispatch) sum to 0.44 s — this times every operator of the dense
path in isolation at the exact cfg2 shapes so optimization targets the
measured bottleneck, mirroring profile_streaming.py for the streaming path.
Run on the real TPU:

    python benchmarks/profile_dense.py

Appends rows (profile="dense_cfg2") to benchmarks/results/profile.jsonl.
"""

from __future__ import annotations

import functools
import json
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


def _sync(out):
    """4-byte scalar readback: on this box's remote 'axon' platform
    block_until_ready returns BEFORE device completion (same trap bench.py's
    device_only_wall works around) — reading one element is the only
    reliable completion barrier. The first leaf suffices: ops execute in
    dispatch order on the single stream."""
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    idx = tuple(slice(0, 1) for _ in range(leaf.ndim))
    float(jnp.sum(leaf[idx].astype(jnp.float32)))


def timed(fn, *args, reps=5):
    out = fn(*args)                               # warmup + compile
    _sync(out)
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        walls.append(time.perf_counter() - t0)
    return min(walls), jax.block_until_ready(out)


def main():
    import jax.numpy as jnp
    import jax.scipy.linalg as jsl

    import graphlap_tpu as gl
    from graphlap_tpu.models.pipeline import make_plan
    from graphlap_tpu.ops.affinity import affinity_blocks, extract_features
    from graphlap_tpu.ops.filters import apply_spectral_filter
    from graphlap_tpu.ops.linalg import trunc_inv_sqrt_vals
    from graphlap_tpu.ops.pallas_affinity import affinity_strip_pallas
    from graphlap_tpu.ops.sinkhorn import normalize_blocks, sinkhorn_scaling

    H = W = 512
    cfg = gl.CONFIG2.replace(use_pallas=True, affinity_dtype="bfloat16_store",
                             sinkhorn_iters=8)
    img = gl.make_test_image(H, W)
    noisy = np.clip(gl.add_gaussian_noise(img, 0.1, seed=1), 0, 1)
    plan = make_plan(noisy, cfg)
    n, p, m = H * W, plan.p, cfg.num_eigvecs
    rows = []

    def rec(op, wall, note=""):
        rows.append({"profile": "dense_cfg2", "op": op,
                     "wall_s": round(wall, 5), "note": note,
                     "n": n, "p": p, "m": m, "ts": time.time()})
        print(f"{op:28s} {wall * 1e3:9.2f} ms  {note}")

    img_d = jax.device_put(jnp.asarray(noisy, jnp.float32))
    idx_a = jax.device_put(jnp.asarray(plan.idx_a))
    perm = jax.device_put(jnp.asarray(plan.perm))

    # dispatch + scalar-readback constant every row below pays (tunnel RTT)
    wall, _ = timed(jax.jit(lambda x: x + 1.0), jnp.ones((8, 128)))
    rec("sync_overhead", wall, "tiny op + readback: the per-row floor")

    # --- stage 1: features + affinity strip -------------------------------
    feat_fn = jax.jit(lambda im: extract_features(im, cfg))
    wall, feats = timed(feat_fn, img_d)
    rec("features_nlm5x5", wall, f"(N={n}, d={feats.shape[1]})")
    feats_a = jnp.take(feats, idx_a, axis=0)

    emit = jax.jit(functools.partial(
        affinity_strip_pallas, dtype=jnp.bfloat16, store_dtype=jnp.bfloat16,
        interpret=False))
    wall, strip = timed(emit, feats_a, feats)
    rec("affinity_pallas_bf16store", wall, "fused emit, (p, N) bf16 out")

    wall, _ = timed(jax.jit(functools.partial(
        affinity_strip_pallas, dtype=jnp.float32, store_dtype=jnp.float32,
        interpret=False)), feats_a, feats)
    rec("affinity_pallas_f32", wall, "A/B: f32 in+out")

    full_fn = jax.jit(lambda im, ia, pm: affinity_blocks(im, ia, pm, cfg))
    wall, (kaa, kab) = timed(full_fn, img_d, idx_a, perm)
    rec("affinity_blocks_full", wall,
        "production: features+gather+emit+split")

    # --- stage 2: Sinkhorn -------------------------------------------------
    sink = jax.jit(lambda a, b: sinkhorn_scaling(
        a, b, cfg.sinkhorn_iters, cfg.eig_tol, cfg.solver))
    wall, _ = timed(sink, kaa, kab)
    rec(f"sinkhorn_{cfg.sinkhorn_iters}it", wall,
        "2 strip matvecs/iter + chol solve")

    norm = jax.jit(lambda a, b: normalize_blocks(
        a, b, cfg.normalization, cfg.sinkhorn_iters, cfg.eig_tol, cfg.solver))
    wall, (waa, wab, _, _) = timed(norm, kaa, kab)
    rec("normalize_full", wall, "sinkhorn + strip rescale epilogue")

    # --- stage 3: eigensolve, decomposed ----------------------------------
    wall, cross = timed(jax.jit(
        lambda b: jnp.dot(b, b.T, preferred_element_type=jnp.float32,
                          precision="default")), wab)
    rec("cross_gemm_bf16", wall, "W_AB W_AB^T, bf16 in / f32 acc")

    waa32 = waa.astype(jnp.float32)
    wall, _ = timed(jax.jit(lambda a: a @ a), waa32)
    rec("waa_sq_f32", wall, "W_AA^2, f32 HIGHEST")

    eps = cfg.eig_tol * jnp.max(jnp.sum(jnp.abs(waa32), axis=1))
    amat = waa32 + eps * jnp.eye(p, dtype=jnp.float32)
    wall, l = timed(jax.jit(jnp.linalg.cholesky), amat)
    rec("cholesky_pxp", wall)

    g = jax.block_until_ready(jax.jit(lambda a, c: a @ a + c)(waa32, cross))
    trsm1 = jax.jit(lambda l_, g_: jsl.solve_triangular(l_, g_, lower=True))
    wall, t1 = timed(trsm1, l, g)
    rec("trsm_pxp_1", wall, "L^{-1} G (p-wide RHS)")
    trsm2 = jax.jit(lambda l_, t_: jsl.solve_triangular(l_, t_.T, lower=True))
    wall, m_mat = timed(trsm2, l, t1)
    rec("trsm_pxp_2", wall, "L^{-1} G^T L^{-T}")
    m_mat = jax.block_until_ready(
        jax.jit(lambda mm: 0.5 * (mm + mm.T))(m_mat))

    from jax.experimental.sparse.linalg import lobpcg_standard

    x0 = jax.random.normal(jax.random.PRNGKey(0), (p, m), jnp.float32)

    def lob(mm, x):
        vals, y, _ = lobpcg_standard(lambda v: mm @ v, x, m=cfg.lobpcg_iters)
        return vals, y
    wall, (vals_m, y_m) = timed(jax.jit(lob), m_mat, x0)
    rec(f"lobpcg_m{m}_cap{cfg.lobpcg_iters}", wall, "on materialized M")

    wall, _ = timed(jax.jit(jnp.linalg.eigh), m_mat)
    rec("eigh_pxp", wall, "A/B: dense eigh of M")

    inv_sqrt = trunc_inv_sqrt_vals(vals_m, cfg.eig_tol)
    trsmx = jax.jit(lambda l_, y_: jsl.solve_triangular(
        l_, y_ * inv_sqrt[None, :], lower=True, trans="T"))
    wall, x = timed(trsmx, l, y_m)
    rec("trsm_pxm_factor", wall, "thin RHS (p, m)")

    ext = jax.jit(lambda b, x_: b.T @ x_)
    wall, _ = timed(ext, wab, x)
    rec("extension_gemm", wall, "W_AB^T X -> (N-p, m)")

    # --- stage 4: filter apply ---------------------------------------------
    vecs = jax.block_until_ready(jax.jit(
        lambda a, b, x_: jnp.concatenate([a @ x_, b.T @ x_], axis=0))(
            waa, wab, x))
    y_perm = jnp.take(img_d.ravel(), perm)
    app = jax.jit(lambda yp, va, ve: apply_spectral_filter(
        yp, va, ve, cfg.filter_name, cfg.filter_param))
    wall, _ = timed(app, y_perm, vals_m, vecs)
    rec("filter_apply", wall, "O(N m) projection")

    with RESULTS.open("a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"\n{len(rows)} rows -> {RESULTS}")


if __name__ == "__main__":
    main()
