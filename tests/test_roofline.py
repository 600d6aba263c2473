"""Roofline accounting (utils/roofline): XLA-derived stage costs.

The analytic cost models are estimates and may drift from the code (they
did in round 3 — committed rows showed frac_of_roofline > 1); the
XLA-derived counts are read from the optimized HLO of the SAME stage jits
the staged pipeline times, so these tests pin the contract that matters:
every timed stage gets a cost entry, counts are positive where the stage
does real work, and the dominant count matches the stage's known
character (the affinity/normalize sweeps are exp-carrying, the filter
apply is not).
"""

import numpy as np
import pytest

import graphlap_tpu as gl
from graphlap_tpu.models.pipeline import make_plan
from graphlap_tpu.utils.roofline import roofline_report, xla_stage_costs

PEAKS = {"bf16_matmul_tflops": 175.5, "f32_matmul_tflops": 30.6,
         "exp_f32_g_per_s": 84.4, "exp_bf16_g_per_s": 174.4,
         "hbm_stream_gbs": 796.6}


@pytest.fixture(scope="module")
def img():
    return gl.make_test_image(64, 64)


def _costs(img2d, cfg):
    plan = make_plan(img2d, cfg)
    costs = xla_stage_costs(img2d.shape, cfg, plan)
    assert costs is not None
    return plan, costs


def test_dense_spectral_stages(img):
    cfg = gl.PipelineConfig(kernel="nlm", h=0.15, sample_rho=0.02,
                            num_eigvecs=10)
    plan, costs = _costs(img, cfg)
    assert set(costs) == {"affinity", "normalize", "eigensolve", "filter"}
    # the affinity stage evaluates exp once per strip entry (p*N up to
    # padding/fusion slack); XLA counts the same program we run
    assert costs["affinity"]["trans"] >= plan.p * plan.n * 0.9
    assert costs["affinity"]["mxu_flops"] > 0
    # the spectral apply does no kernel evaluations
    assert costs["filter"]["trans"] == 0
    assert all(c["hbm_bytes"] > 0 for c in costs.values())


def test_dense_matvec_has_no_eigensolve_stage(img):
    cfg = gl.PipelineConfig(kernel="nlm", h=0.15, sample_rho=0.02,
                            num_eigvecs=10, filter_mode="matvec",
                            filter_name="identity")
    _, costs = _costs(img, cfg)
    assert set(costs) == {"affinity", "normalize", "filter"}


def test_streaming_spectral_stages(img):
    cfg = gl.PipelineConfig(kernel="nlm", h=0.15, sample_rho=0.02,
                            num_eigvecs=10, streaming=True, block_cols=2048)
    plan, costs = _costs(img, cfg)
    assert set(costs) == {"normalize", "eigensolve", "filter"}
    # recompute model: both the Sinkhorn and gram/colstats stages re-emit
    # kernel tiles, so each carries >= one p*N exp sweep's transcendentals
    assert costs["normalize"]["trans"] >= plan.p * plan.n * 0.9
    assert costs["eigensolve"]["trans"] >= plan.p * plan.n * 0.9


def test_streaming_matvec_filter_recomputes(img):
    cfg = gl.PipelineConfig(kernel="nlm", h=0.15, sample_rho=0.02,
                            num_eigvecs=10, streaming=True, block_cols=2048,
                            filter_mode="matvec", filter_name="identity")
    plan, costs = _costs(img, cfg)
    assert set(costs) == {"normalize", "filter"}
    # matvec mode's apply IS strip passes — it carries the exp sweeps
    assert costs["filter"]["trans"] >= plan.p * plan.n * 0.9


def test_report_shape_and_bounds(img):
    cfg = gl.PipelineConfig(kernel="nlm", h=0.15, sample_rho=0.02,
                            num_eigvecs=10)
    _, costs = _costs(img, cfg)
    walls = {k: 1.0 for k in costs}      # fixed walls: fractions = count/peak
    rep = roofline_report(costs, walls, PEAKS, "float32")
    for stage, row in rep.items():
        assert row["bound"] in ("exp", "mxu", "hbm")
        assert row["frac_of_roofline"] == max(
            row["frac_exp_peak"], row["frac_mxu_peak"], row["frac_hbm_peak"])
        assert np.isfinite(row["tflops"])
    # a stage absent from walls is skipped, not crashed
    rep2 = roofline_report(costs, {"affinity": 1.0}, PEAKS, "float32")
    assert set(rep2) == {"affinity"}
