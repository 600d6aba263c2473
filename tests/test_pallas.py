"""Pallas fused affinity kernel vs oracle (interpret mode on CPU;
the real-TPU run happens in bench/benchmarks)."""

import jax.numpy as jnp
import numpy as np
import pytest

from graphlap_tpu.config import PipelineConfig
from graphlap_tpu.io import make_test_image
from graphlap_tpu.ops.affinity import affinity_strip_np, extract_features_np
from graphlap_tpu.ops.pallas_affinity import affinity_strip_pallas
from graphlap_tpu.utils.sampling import uniform_grid_sample


@pytest.fixture(scope="module")
def feats():
    img = make_test_image(48, 48, seed=3)
    cfg = PipelineConfig(kernel="nlm", h=0.25, spatial_h=24.0)
    plan = uniform_grid_sample(48, 48, 100)
    return extract_features_np(img, cfg)[plan.perm]


def test_pallas_matches_oracle_f32(feats):
    truth = affinity_strip_np(feats[:100], feats)
    out = np.asarray(affinity_strip_pallas(
        jnp.asarray(feats[:100], jnp.float32), jnp.asarray(feats, jnp.float32)))
    assert out.shape == truth.shape
    np.testing.assert_allclose(out, truth, atol=5e-5)


def test_pallas_bf16_reasonable(feats):
    truth = affinity_strip_np(feats[:100], feats)
    out = np.asarray(affinity_strip_pallas(
        jnp.asarray(feats[:100], jnp.float32), jnp.asarray(feats, jnp.float32),
        dtype=jnp.bfloat16))
    assert np.abs(out - truth).max() < 2e-2


def test_pallas_unaligned_shapes(feats):
    """p and N not multiples of the tile sizes -> padding is exact."""
    sub = feats[:77]
    truth = affinity_strip_np(sub, feats[:1000])
    out = np.asarray(affinity_strip_pallas(
        jnp.asarray(sub, jnp.float32), jnp.asarray(feats[:1000], jnp.float32)))
    assert out.shape == (77, 1000)
    np.testing.assert_allclose(out, truth, atol=5e-5)


def test_pallas_feature_dim_guard():
    big = jnp.zeros((8, 200), jnp.float32)
    with pytest.raises(ValueError):
        affinity_strip_pallas(big, big)


def test_pipeline_with_pallas_flag(feats):
    """cfg.use_pallas routes the fused kernel through the full pipeline."""
    from graphlap_tpu import filter_image
    img = make_test_image(48, 48, seed=3)
    cfg = PipelineConfig(kernel="nlm", h=0.25, sample_rho=0.04, num_eigvecs=16)
    a = filter_image(img, cfg)
    b = filter_image(img, cfg.replace(use_pallas=True))
    np.testing.assert_allclose(a.image, b.image, atol=1e-4)


def test_colstats_v_pallas_matches_xla():
    """Fused colstats+V kernel == the XLA scan twin (interpret mode), in
    both f32 and the bf16-GEMM-inputs-only precision policy."""
    import jax.numpy as jnp

    from graphlap_tpu.ops import pallas_streaming as pst
    from graphlap_tpu.ops import streaming as st

    rng = np.random.default_rng(3)
    p, n_pad, d, m, block = 512, 2048, 25, 20, 512
    feats_a = jnp.asarray(rng.normal(size=(p, d)).astype(np.float32))
    feats_pad = jnp.asarray(rng.normal(size=(n_pad, d)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(p, m)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(n_pad,)).astype(np.float32))
    rs = jnp.asarray(rng.uniform(0.5, 1.5, p).astype(np.float32))
    cs = jnp.asarray(rng.uniform(0.0, 1.5, n_pad).astype(np.float32))

    _, p_pad = pst.p_tiling(p)
    gr = (jnp.zeros((p_pad, pst.M_PAD), jnp.float32)
          .at[:p, :m].set(g * rs[:, None]))
    na = (jnp.zeros(p_pad, jnp.float32)
          .at[:p].set(jnp.sum(feats_a * feats_a, axis=1)))
    nb = jnp.sum(feats_pad * feats_pad, axis=1)

    for dtype, atol in ((jnp.float32, 1e-5), (jnp.bfloat16, 2e-3)):
        norms_x, coeffs_x, v_x = st.rmatmat_colstats_v(
            feats_a, feats_pad, g, y, rs, cs, block, dtype)
        fa_pad = (jnp.zeros((p_pad, pst.D_PAD), dtype)
                  .at[:p, :d].set(feats_a.astype(dtype)))
        f_t = (jnp.zeros((pst.D_PAD, n_pad), dtype)
               .at[:d, :].set(feats_pad.astype(dtype).T))
        v_p, ns_p, co_p = pst.colstats_v_pallas(fa_pad, f_t, gr, y, cs,
                                                na, nb)
        np.testing.assert_allclose(np.asarray(v_p[:, :m]), np.asarray(v_x),
                                   atol=atol)
        np.testing.assert_allclose(np.asarray(ns_p[:m]), np.asarray(norms_x),
                                   rtol=100 * atol)
        np.testing.assert_allclose(np.asarray(co_p[:m]), np.asarray(coeffs_x),
                                   rtol=100 * atol, atol=10 * atol)
        assert float(jnp.abs(v_p[:, m:]).max()) == 0.0   # pad cols exact 0

    # a width the grid would FLOOR past (n_pad % EMIT_TN != 0 — e.g. the
    # f32 matvec tiling's 256-padding) must raise, not silently zero the
    # tail columns
    f_t_odd = (jnp.zeros((pst.D_PAD, n_pad + 256), jnp.float32)
               .at[:d, :n_pad].set(feats_pad.astype(jnp.float32).T))
    fa32 = (jnp.zeros((p_pad, pst.D_PAD), jnp.float32)
            .at[:p, :d].set(feats_a))
    import pytest
    with pytest.raises(ValueError, match="EMIT_TN"):
        pst.colstats_v_pallas(fa32, f_t_odd,
                              gr, jnp.zeros(n_pad + 256), jnp.zeros(n_pad + 256),
                              na, jnp.zeros(n_pad + 256))


def test_ext2_matvec_pallas_matches_xla():
    """Fused extension+polish-matvec kernel == the two-sweep XLA
    composition (rmatvec2 -> s -> matvec), f32 exact / bf16 same class."""
    import jax.numpy as jnp

    from graphlap_tpu.ops import pallas_streaming as pst
    from graphlap_tpu.ops import streaming as st

    rng = np.random.default_rng(5)
    p, n_pad, d, block = 512, 2048, 25, 512
    feats_a = jnp.asarray(rng.normal(0, 0.3, size=(p, d)).astype(np.float32))
    feats_pad = jnp.asarray(
        rng.normal(0, 0.3, size=(n_pad, d)).astype(np.float32))
    t_r = jnp.asarray(rng.uniform(0.5, 1.5, p).astype(np.float32))
    t_c = jnp.asarray(rng.uniform(0.5, 1.5, p).astype(np.float32))
    b_mask = jnp.asarray((rng.uniform(size=n_pad) > 0.2).astype(np.float32))
    ones_p = jnp.ones(p, jnp.float32)
    _, p_pad = pst.p_tiling(p)

    for dtype, tol in ((jnp.float32, 2e-5), (jnp.bfloat16, 2e-2)):
        kbt = st.rmatvec2(feats_a, feats_pad, jnp.stack([t_r, t_c], axis=1),
                          b_mask, block, dtype)
        prod = jnp.maximum(kbt[:, 0] * kbt[:, 1], 1e-30)
        s_x = b_mask / jnp.sqrt(prod)
        u_x = st.matvec(feats_a, feats_pad, s_x, ones_p,
                        jnp.ones_like(s_x), block, dtype)
        dp = pst.d_pad_of(d)
        tn = pst._tile_n(dtype)
        n_k = -(-n_pad // tn) * tn
        fa_pad = (jnp.zeros((p_pad, dp), dtype)
                  .at[:p, :d].set(feats_a.astype(dtype)))
        f_t = (jnp.zeros((dp, n_k), dtype)
               .at[:d, :n_pad].set(feats_pad.astype(dtype).T))
        bm_k = jnp.zeros(n_k, jnp.float32).at[:n_pad].set(b_mask)
        t2 = (jnp.zeros((2, p_pad), jnp.float32)
              .at[0, :p].set(t_r).at[1, :p].set(t_c))
        u_p, s_p = pst.ext2_matvec_pallas(fa_pad, f_t, t2, bm_k)
        scale_u = float(jnp.abs(u_x).max())
        scale_s = float(jnp.abs(s_x).max())
        np.testing.assert_allclose(np.asarray(u_p[:p]), np.asarray(u_x),
                                   atol=tol * scale_u)
        np.testing.assert_allclose(np.asarray(s_p[:n_pad]), np.asarray(s_x),
                                   atol=tol * scale_s)
        if n_k > n_pad:          # pad columns vanish exactly (bm = 0)
            assert float(jnp.abs(s_p[n_pad:]).max()) == 0.0

    with pytest.raises(ValueError, match="whole-p"):
        pst.ext2_matvec_pallas(
            jnp.zeros((2 * pst.MAX_TILE_P, 32), jnp.float32),
            jnp.zeros((32, 1024), jnp.float32),
            jnp.zeros((2, 2 * pst.MAX_TILE_P)), jnp.zeros(1024))


def test_finish_colstats_pallas_matches_xla():
    """Fused rmatvec+scale-update+colstats kernel == the XLA composition
    (rmatvec -> s_new -> rmatmat_colstats_v), both precision classes."""
    import jax.numpy as jnp

    from graphlap_tpu.ops import pallas_streaming as pst
    from graphlap_tpu.ops import streaming as st

    rng = np.random.default_rng(6)
    p, n_pad, d, m, block = 512, 2048, 25, 20, 512
    feats_a = jnp.asarray(rng.normal(0, 0.3, size=(p, d)).astype(np.float32))
    feats_pad = jnp.asarray(
        rng.normal(0, 0.3, size=(n_pad, d)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(p, m)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(n_pad,)).astype(np.float32))
    rs = jnp.asarray(rng.uniform(0.5, 1.5, p).astype(np.float32))
    t = jnp.asarray(rng.uniform(0.5, 1.5, p).astype(np.float32))
    s_pre = jnp.asarray(rng.uniform(0.0, 1.5, n_pad).astype(np.float32))
    b_mask = jnp.asarray((rng.uniform(size=n_pad) > 0.2).astype(np.float32))
    s_pre = s_pre * b_mask
    ones_p = jnp.ones(p, jnp.float32)
    _, p_pad = pst.p_tiling(p)

    for dtype, tol in ((jnp.float32, 2e-5), (jnp.bfloat16, 5e-3)):
        ks_x = st.rmatvec(feats_a, feats_pad, t, ones_p,
                          jnp.ones(n_pad, jnp.float32), block, dtype)
        s_new_x = jnp.sqrt(s_pre / jnp.maximum(ks_x, 1e-30)) * b_mask
        norms_x, coeffs_x, v_x = st.rmatmat_colstats_v(
            feats_a, feats_pad, g, y, rs, s_new_x, block, dtype)
        dp = pst.d_pad_of(d)
        n_k = n_pad                      # 2048 % FIN_TN == 0 already
        fa_pad = (jnp.zeros((p_pad, dp), dtype)
                  .at[:p, :d].set(feats_a.astype(dtype)))
        f_t = (jnp.zeros((dp, n_k), dtype)
               .at[:d, :n_pad].set(feats_pad.astype(dtype).T))
        na = (jnp.zeros(p_pad, jnp.float32)
              .at[:p].set(jnp.sum(feats_a * feats_a, axis=1)))
        nb = jnp.sum(feats_pad * feats_pad, axis=1)
        t_pad = jnp.zeros(p_pad, jnp.float32).at[:p].set(t)
        for m_pad in (64, pst.M_PAD):    # both eigvec pads (m_pad_of)
            gr = (jnp.zeros((p_pad, m_pad), jnp.float32)
                  .at[:p, :m].set(g * rs[:, None]))
            v_p, ns_p, co_p, s_nk = pst.finish_colstats_pallas(
                fa_pad, f_t, t_pad, s_pre, b_mask, gr, y, na, nb)
            sv = float(jnp.abs(v_x).max())
            np.testing.assert_allclose(np.asarray(v_p[:n_pad, :m]),
                                       np.asarray(v_x), atol=tol * sv)
            np.testing.assert_allclose(np.asarray(s_nk[:n_pad]),
                                       np.asarray(s_new_x),
                                       atol=tol * float(jnp.abs(s_new_x)
                                                        .max()))
            np.testing.assert_allclose(np.asarray(ns_p[:m]),
                                       np.asarray(norms_x), rtol=100 * tol)
            np.testing.assert_allclose(np.asarray(co_p[:m]),
                                       np.asarray(coeffs_x), rtol=100 * tol,
                                       atol=tol * float(jnp.abs(coeffs_x)
                                                        .max()))
            assert float(jnp.abs(v_p[:, m:]).max()) == 0.0


def test_streaming_kernels_narrow_d_pad():
    """The kernels accept the production (d_pad_of = 32)-wide feature
    layout — the capacity-enabling one: the 128-wide transposed copy is
    5.1x the NLM data (17 GB at 64 MP bf16), the 32-wide one 1.28x —
    and match the legacy 128-wide pads to reduction-order noise (zero
    feature columns are exact no-ops in the dots; the norm reductions
    re-associate with the padded width, so last-ulp, not bitwise)."""
    import jax.numpy as jnp

    from graphlap_tpu.ops import pallas_streaming as pst

    rng = np.random.default_rng(7)
    p, n_pad, d = 512, 1024, 25
    assert pst.d_pad_of(d) == 32
    # realistic feature scale (unit-scale features drive exp(-d2) to 0)
    feats_a = rng.normal(0, 0.1, size=(p, d)).astype(np.float32)
    feats = rng.normal(0, 0.1, size=(n_pad, d)).astype(np.float32)
    v = rng.normal(size=(n_pad,)).astype(np.float32)
    t = rng.normal(size=(p,)).astype(np.float32)
    _, p_pad = pst.p_tiling(p)

    def pads(dp, dtype):
        fa = (jnp.zeros((p_pad, dp), dtype)
              .at[:p, :d].set(jnp.asarray(feats_a, dtype)))
        ft = (jnp.zeros((dp, n_pad), dtype)
              .at[:d, :].set(jnp.asarray(feats, dtype).T))
        return fa, ft

    for dtype, rtol in ((jnp.float32, 1e-5), (jnp.bfloat16, 1e-2)):
        fa32, ft32 = pads(32, dtype)
        fa128, ft128 = pads(128, dtype)
        np.testing.assert_allclose(
            np.asarray(pst.matvec_pallas(fa32, ft32, jnp.asarray(v))),
            np.asarray(pst.matvec_pallas(fa128, ft128, jnp.asarray(v))),
            rtol=rtol, atol=rtol)
        np.testing.assert_allclose(
            np.asarray(pst.rmatvec_pallas(fa32, ft32, jnp.asarray(t))),
            np.asarray(pst.rmatvec_pallas(fa128, ft128, jnp.asarray(t))),
            rtol=rtol, atol=rtol)

    # mismatched / unaligned pads must refuse loudly, not compute garbage
    fa32, ft32 = pads(32, jnp.float32)
    _, ft128 = pads(128, jnp.float32)
    with pytest.raises(ValueError, match="d_pad_of"):
        pst.matvec_pallas(fa32, ft128, jnp.asarray(v))
    with pytest.raises(ValueError, match="multiple"):
        pst.rmatvec_pallas(fa32[:, :24], ft32[:24], jnp.asarray(t))


def test_aug_pads_survives_jit():
    """aug_pads under jit must produce the SAME operands as eager.
    XLA:TPU's excess-precision simplifier elides f32->bf16->f32
    round-trips inside a fused program: before the optimization_barriers
    in aug_pads, a jitted trace computed na/nb from the UNROUNDED
    features and collapsed the compensated split lanes to exact zero
    (measured on-chip: jit lanes [35.25, 0, 0] vs eager
    [35.5, -0.1235, 0.00022]) — the r5 0.65-0.88 dB matvec-route
    regression. Eager/CPU/staged runs never reproduce it, so pin BOTH
    eager==jit equality and the structural property that the mid lanes
    are nonzero (a collapsed split zeroes them on any backend)."""
    from graphlap_tpu.ops import pallas_streaming as pst

    rng = np.random.default_rng(11)
    p, n, d = 16, 32, 25
    fa = jnp.asarray(rng.random((p, d), np.float32) * 2.0)
    fn = jnp.asarray(rng.random((n, d), np.float32) * 2.0)
    import jax

    eag = pst.aug_pads(fa, fn, 32)
    jit = jax.jit(lambda a, b: pst.aug_pads(a, b, 32))(fa, fn)
    for e, j in zip(eag, jit):
        np.testing.assert_array_equal(np.asarray(e, np.float32),
                                      np.asarray(j, np.float32))
    # mid compensation lanes must carry actual residue, not zeros
    assert np.abs(np.asarray(jit[0], np.float32)[:p, d + 1]).max() > 0
    assert np.abs(np.asarray(jit[1], np.float32)[d + 4, :n]).max() > 0


def test_aug_layout_matches_plain_at_large_norms():
    """The augmented-GEMM layout must reproduce the PLAIN bf16 tile
    essentially exactly at PRODUCTION feature magnitudes (NLM features
    scaled 1/h carry square norms ~100): the three-lane compensated
    split's residue (~2^-24 |f|^2) re-quantizes to the IDENTICAL bf16
    kernel tile (aug_numerics probe: kb diff exactly 0), so aug and
    plain matvec/rmatvec outputs must agree to f32-accumulation noise,
    NOT a loose quality tolerance. (The r5 quality regression was NOT
    this tile math but XLA eliding the roundings under jit — see
    test_aug_pads_survives_jit.)"""
    from graphlap_tpu.ops import pallas_streaming as pst

    rng = np.random.default_rng(7)
    p, n, d = 256, 2048, 25
    # production-scale magnitudes: the h-scaled NLM feature lanes measure
    # range [0, 2] with square norms up to ~87 on the 512^2 test image
    # (.scratch-r5/aug_numerics.py probe) — match that class
    base = rng.random((n, d), np.float32) * 2.0
    fa = jnp.asarray(base[:p])
    fn = jnp.asarray(base)
    _, p_pad = pst.p_tiling(p)
    tn = pst._tile_n(jnp.bfloat16)
    n_pad = ((n + tn - 1) // tn) * tn

    fa_aug, ft_aug = pst.aug_pads(fa, fn, n_pad)
    dp_plain = pst.d_pad_of(d)
    fa_plain = jnp.zeros((p_pad, dp_plain), jnp.bfloat16).at[:p, :d].set(
        fa.astype(jnp.bfloat16))
    ft_plain = jnp.zeros((dp_plain, n_pad), jnp.bfloat16).at[:d, :n].set(
        fn.astype(jnp.bfloat16).T)

    v = jnp.zeros(n_pad, jnp.float32).at[:n].set(
        jnp.asarray(rng.standard_normal(n), jnp.float32))
    mv_aug = np.asarray(pst.matvec_pallas(fa_aug, ft_aug, v, aug=True))[:p]
    mv_pl = np.asarray(pst.matvec_pallas(fa_plain, ft_plain, v,
                                         aug=False))[:p]
    scale = np.abs(mv_pl).max()
    assert np.abs(mv_aug - mv_pl).max() <= 5e-5 * scale

    t = jnp.zeros(p_pad, jnp.float32).at[:p].set(
        jnp.asarray(rng.standard_normal(p), jnp.float32))
    rmv_aug = np.asarray(pst.rmatvec_pallas(fa_aug, ft_aug, t, aug=True))[:n]
    rmv_pl = np.asarray(pst.rmatvec_pallas(fa_plain, ft_plain, t,
                                           aug=False))[:n]
    rscale = np.abs(rmv_pl).max()
    assert np.abs(rmv_aug - rmv_pl).max() <= 5e-5 * rscale
