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
