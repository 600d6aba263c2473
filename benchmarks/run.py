"""Benchmark harness: the BASELINE.md target matrix as reproducible rows.

Runs the graded configs that fit the available hardware and appends one
JSON row each to benchmarks/results/matrix.jsonl (SURVEY.md §5
observability, §6 table). Usage:

    python benchmarks/run.py               # all rows that fit this host
    python benchmarks/run.py 1 2           # specific rows
    python benchmarks/run.py --cpu         # force CPU backend (debug)
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

RESULTS = Path(__file__).parent / "results" / "matrix.jsonl"


def row1():
    """128x128 gray + noise, Gaussian kernel, 1% sample, 50 eigenpairs."""
    import graphlap_tpu as gl
    img = gl.make_test_image(128, 128)
    noisy = np.clip(gl.add_gaussian_noise(img, 0.1, seed=1), 0, 1)
    return "cfg1_128_gaussian", gl.CONFIG1, img, noisy


def row2():
    """512x512 gray, NLM 5x5 + Sinkhorn, 2% sample (p=5243)."""
    import graphlap_tpu as gl
    img = gl.make_test_image(512, 512)
    noisy = np.clip(gl.add_gaussian_noise(img, 0.1, seed=1), 0, 1)
    # production recipe = the 'fast' preset (Pallas emitter +
    # bfloat16_store strip + coarse 1/16-column Sinkhorn(8) + one full-res
    # polish + power-0 sketch eigensolver — every step seed-swept in
    # cfg2_sweep.jsonl); deriving it here keeps the matrix row tracking
    # what '-preset fast' actually ships
    cfg = gl.tuned_config(gl.CONFIG2, 512 * 512, "fast")
    return "cfg2_512_nlm", cfg, img, noisy


def row3():
    """1024x1024 RGB per-channel, noise + sharpening filter.

    Streaming path: a materialized strip at p=4096, N=1M is 17 GB — over
    HBM. Streaming recompute keeps it at O(N d) (~110 MB of features).
    Mild noise is added so psnr_in/out are recorded (BASELINE config 3
    grades "PSNR/visual"); SSIM + gradient-energy ratio capture the
    enhancement effect itself.

    The recipe derives from '-preset fast', which routes the affine
    sharpen to filter_mode="matvec" (exact polynomial f(W) y, no
    gram/eigensolve): the rank-m SPECTRAL sharpen is ill-posed on this
    config's collapsed spectrum — every accelerated recipe measured
    1.8-4.6 dB off the exact trajectory, vs 0.002-0.007 dB for the matvec
    recipes (benchmarks/results/cfg3_sweep.jsonl, config.AFFINE_FILTERS).
    """
    import graphlap_tpu as gl
    img = gl.make_test_image(1024, 1024, channels=3)
    noisy = np.clip(gl.add_gaussian_noise(img, 0.03, seed=3), 0, 1)
    cfg = gl.tuned_config(
        gl.CONFIG3.replace(streaming=True, block_cols=131072),
        1024 * 1024, "fast")
    return "cfg3_1024_rgb_sharpen", cfg, img, noisy


def row3l():
    """cfg3 with the shared-luma-basis guided mode (rgb_mode='luma_basis'):
    one eigenbasis from the BT.601 luminance graph, three O(N m) filter
    applies — affinity/Sinkhorn/eigensolve run once instead of three
    times."""
    name, cfg, img, noisy = row3()
    return ("cfg3_1024_rgb_luma", cfg.replace(rgb_mode="luma_basis"),
            img, noisy)


def row4():
    """8 MP (4096x2048) gray, streaming recompute path, bf16 strip."""
    import graphlap_tpu as gl
    img = gl.make_test_image(2048, 4096)
    noisy = np.clip(gl.add_gaussian_noise(img, 0.1, seed=1), 0, 1)
    cfg = gl.PipelineConfig(
        kernel="nlm", h=0.25, sample_rho=0.01, sample_cap=4096,
        num_eigvecs=50, sinkhorn_iters=10, filter_name="identity",
        streaming=True, block_cols=131072, affinity_dtype="bfloat16")
    return "cfg4_8mp_streaming", cfg, img, noisy


def row5():
    """Video batch (config 5 shape at single-chip scale): 8x 512^2 frames
    through the (data, rows)-sharded pipeline. On a pod this scales over
    the data axis via jax.distributed (scripts/multihost_launch.py)."""
    import graphlap_tpu as gl
    frames = np.stack([
        np.clip(gl.add_gaussian_noise(gl.make_test_image(512, 512, seed=s),
                                      0.1, seed=s), 0, 1)
        for s in range(8)
    ])
    # batched STREAMING path (one jit step for all 8 frames: per-step
    # memory is O(B(Nd + p^2)) ~ 0.2 GB, vs 8 dense strips ~ 11 GB which
    # cannot compile on one chip)
    cfg = gl.PipelineConfig(kernel="nlm", h=0.25, sample_rho=0.005,
                            num_eigvecs=50, sinkhorn_iters=10,
                            affinity_dtype="bfloat16", streaming=True,
                            block_cols=32768, gram_coarse=4)
    return "cfg5_video_8x512", cfg, frames, frames


def row6():
    """32 MP (8192x4096) single-chip CAPACITY row (beyond the graded
    matrix): the streaming path's O(Nd) memory keeps 4x the cfg4 shape on
    one chip. Pallas held OFF by a measured A/B, not memory anymore:
    since the 32-wide feature pad (ops/pallas_streaming.d_pad_of) the
    fused path FITS here (~2.1 GB transposed copy vs the old 128-lane
    pad's ~8.6 GB), but measured 1.93 s device vs the XLA scan's 1.84 s
    at this shape (matrix.jsonl 2026-08-18) — the streaming passes are
    exp-bound and XLA already fuses the single-consumer chain, same
    verdict as the colstats fusion study (ARCHITECTURE §5). V
    materialization auto-disables (N*m*4 > _V_BYTES_CAP)."""
    import graphlap_tpu as gl
    img = gl.make_test_image(4096, 8192)
    noisy = np.clip(gl.add_gaussian_noise(img, 0.1, seed=1), 0, 1)
    base = gl.PipelineConfig(kernel="nlm", h=0.25, sample_rho=0.01,
                             sample_cap=4096, num_eigvecs=50,
                             filter_name="identity", streaming=True,
                             block_cols=131072, use_pallas=False)
    cfg = gl.tuned_config(base, 4096 * 8192, "fast",
                          keep=frozenset({"use_pallas"}))
    return "cfg6_32mp_streaming", cfg, img, noisy


def row7():
    """64 MP (8192x8192) single-chip capacity row — enabled by the bf16
    feature store (feature_dtype): the (N, 25) features drop 6.4 -> 3.2 GB,
    the only O(N d) buffer in the streaming regime (ARCHITECTURE §6).
    XLA scan rather than Pallas by the row-6 A/B (the fused path now
    FITS via the 32-wide pad, ~4.3 GB here, but measures equal-or-slower
    at capacity shapes — see row6 docstring)."""
    import graphlap_tpu as gl
    img = gl.make_test_image(8192, 8192)
    noisy = np.clip(gl.add_gaussian_noise(img, 0.1, seed=1), 0, 1)
    base = gl.PipelineConfig(kernel="nlm", h=0.25, sample_rho=0.01,
                             sample_cap=4096, num_eigvecs=50,
                             filter_name="identity", streaming=True,
                             block_cols=131072, use_pallas=False,
                             feature_dtype="bfloat16")
    cfg = gl.tuned_config(base, 8192 * 8192, "fast",
                          keep=frozenset({"use_pallas", "feature_dtype"}))
    return "cfg7_64mp_streaming_bf16feat", cfg, img, noisy


def row8():
    """128 MP (16384x8192) — PAST the single-chip feature-buffer ceiling
    (64 MP bf16-feat, row7): the tiled out-of-core mode (models/tiled.py)
    runs 4096^2 tiles (16.8 MP each, comfortably in-capacity) through ONE
    compiled executable with normalized-Hann blending. No same-size
    untiled twin can exist on one chip; the per-tile recipe carries the
    preset's measured parity bounds, and the blend is exactness-pinned by
    tests/test_tiled.py."""
    import graphlap_tpu as gl
    img = gl.make_test_image(8192, 16384)
    noisy = np.clip(gl.add_gaussian_noise(img, 0.1, seed=1), 0, 1)
    base = gl.PipelineConfig(kernel="nlm", h=0.25, sample_rho=0.01,
                             sample_cap=4096, num_eigvecs=50,
                             filter_name="identity", streaming=True,
                             block_cols=131072, use_pallas=False)
    # preset calibrated at the TILE size — that is the executable's shape
    cfg = gl.tuned_config(base, 4096 * 4096, "fast",
                          keep=frozenset({"use_pallas"}))
    return "cfg8_128mp_tiled", cfg, img, noisy


def run_tiled_row(name, cfg, clean, image, tile, overlap):
    import jax
    import graphlap_tpu as gl

    t0 = time.perf_counter()
    gl.filter_image_tiled(image, cfg, tile=tile, overlap=overlap)  # warm
    compile_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = gl.filter_image_tiled(image, cfg, tile=tile, overlap=overlap)
    wall = time.perf_counter() - t0
    mp = image.shape[0] * image.shape[1] / 1e6
    # per-TILE executable footprint (that is what must fit HBM in this mode)
    from graphlap_tpu.models.pipeline import make_plan
    from graphlap_tpu.utils.meminfo import peak_hbm_gib
    tplan = make_plan(image[:tile, :tile], cfg)
    peak_hbm, hbm_source = peak_hbm_gib((tile, tile), cfg, tplan)
    rec = {
        "row": name, "backend": jax.default_backend(),
        "device": str(jax.devices()[0]), "peak_hbm_gib": peak_hbm,
        "peak_hbm_source": hbm_source,
        "shape": list(image.shape), "tile": tile, "overlap": overlap,
        "n_tiles": int(res.eigvals.shape[0]),
        "config_hash": cfg.config_hash(),
        "wall_s": round(wall, 2), "compile_s": round(compile_wall, 2),
        "mp_per_s": round(mp / wall, 3),
        "psnr_in_db": round(gl.psnr(clean, image), 3),
        "psnr_out_db": round(gl.psnr(clean, res.image), 3),
        "ts": time.time(),
    }
    RESULTS.parent.mkdir(parents=True, exist_ok=True)
    with RESULTS.open("a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    return rec


def row4c():
    """8 MP with the coarse (decimated) Sinkhorn accelerator."""
    name, cfg, img, noisy = row4()
    return "cfg4_8mp_coarse16", cfg.replace(sinkhorn_coarse=16), img, noisy


def row4g():
    """8 MP HEADLINE: gate-compliant fast recipe (bf16 + coarse gram).
    Measured 0.001-0.006 dB vs the f32-exact reference at this exact shape
    (benchmarks/results/cfg4_sweep.jsonl) — coarse gram perturbs only the
    p x p spectrum while Sinkhorn and all column stats stay exact."""
    name, cfg, img, noisy = row4()
    return "cfg4_8mp_bf16_gc8", cfg.replace(gram_coarse=8), img, noisy


def row4x():
    """8 MP MAX TURBO: both decimations (jittered gc64), bf16 + Pallas, no
    polish — 0.311 s / 27 MP/s single-chip, 0.26-0.32 dB from the
    f32-exact trajectory across seeds (documented as secondary, not the
    parity headline; cfg4_sweep.jsonl jit_turbo_gc64 rows)."""
    name, cfg, img, noisy = row4()
    return ("cfg4_8mp_turbo_sc64_gc64",
            cfg.replace(sinkhorn_iters=6, block_cols=65536,
                        sinkhorn_coarse=64, gram_coarse=64,
                        use_pallas=True), img, noisy)


def row4p():
    """8 MP COMPLIANT TURBO: both decimations + bf16 + Pallas + ONE
    full-resolution Sinkhorn polish iteration — the polish contracts the
    Sinkhorn decimation bias back under the parity gate, and the JITTERED
    gram sample (models/streaming.gram_sample_idx) keeps the p x p
    spectrum seed-robust at gc64 (0.031-0.054 dB vs the f32-exact
    trajectory across 4 seeds, cfg4_sweep.jsonl jit_* rows). With the
    round-3 FUSED FINISH (the four full-res finishing sweeps in two
    Pallas passes, spectrum from the decimated post-polish rmatvec):
    0.488 -> 0.394 s device = ~21 MP/s single-chip at 0.0035-0.0116 dB
    (cfg4_sweep.jsonl ffin2_* rows). The <1 s BASELINE target (spec'd
    for a v4-8 slice) is met on ONE chip by a gate-compliant recipe."""
    name, cfg, img, noisy = row4()
    # tuned from cfg4_sweep.jsonl: once the full-res polish runs, coarse
    # iterations barely matter (10 -> 6: 0.705 -> 0.669 s at 0.010 dB),
    # 64k column blocks edge out 128k, and jittered gc64 beats strided gc8
    # by 0.20 s at BETTER cross-seed parity
    return ("cfg4_8mp_compliant_turbo_p1",
            cfg.replace(sinkhorn_iters=6, block_cols=65536,
                        sinkhorn_coarse=64, gram_coarse=64, use_pallas=True,
                        sinkhorn_polish=1, fused_finish=True), img, noisy)


def row4m():
    """8 MP at the gate boundary: sc16+gc4 = 1.50 s, 0.0995 dB measured."""
    name, cfg, img, noisy = row4()
    return ("cfg4_8mp_sc16_gc4",
            cfg.replace(sinkhorn_coarse=16, gram_coarse=4), img, noisy)


def row4q():
    """8 MP QUALITY recipe (round-4 rank study): the denoise_tuned route —
    exact full-rank matvec identity (z = W y, no gram/eigensolve) at
    h = 1.0 sigma. Measured +8.3 dB over the noisy input at sigma=0.1 vs
    the spectral ladder's +2.9 (h=0.25 rank-50) / +4.9 (best spectral h)
    — the rank-m reconstruction is the capacity-scale quality limiter
    (benchmarks/results/rank_study.jsonl). Also FASTER: no cross gram, no
    p x p solve — the cost is the coarse Sinkhorn + polish + one W apply."""
    import graphlap_tpu as gl
    name, cfg, img, noisy = row4()
    cfg = gl.denoise_tuned(cfg, 0.1)                 # -> matvec, h=0.1
    cfg = gl.tuned_config(cfg, noisy.size, "fast")
    return "cfg4_8mp_quality_matvec", cfg, img, noisy


def row6q():
    """32 MP quality twin of row4q (the capacity rows' +2.9 dB was the
    weakest graded-adjacent number — VERDICT r3 #1)."""
    import graphlap_tpu as gl
    name, cfg, img, noisy = row6()
    cfg = gl.denoise_tuned(cfg, 0.1)
    cfg = gl.tuned_config(cfg, noisy.size, "fast",
                          keep=frozenset({"use_pallas"}))
    return "cfg6_32mp_quality_matvec", cfg, img, noisy


def _cfg5_recipe():
    """Config 5's per-4K-frame recipe, derived by the PRESET layer: the
    (N, p)-calibrated decimations land at sc32 + jittered gc32 + one polish
    for a 2160x3840 frame (config.tuned_config 'fast')."""
    import graphlap_tpu as gl
    base = gl.PipelineConfig(kernel="nlm", h=0.25, sample_rho=0.01,
                             sample_cap=4096, num_eigvecs=50,
                             streaming=True, block_cols=129600)
    return gl.tuned_config(base, 2160 * 3840, "fast")


def row5s():
    """Config 5 at its REAL per-frame scale on one chip: 4K frames
    (2160x3840 = 8.3 MP each) through the batched STREAMING path
    (frames on 'data', pixel blocks on 'rows'). The dense video path
    cannot run this shape at all (the per-frame strip is ~136 GB f32)."""
    import graphlap_tpu as gl
    frames = np.stack([
        np.clip(gl.add_gaussian_noise(gl.make_test_image(2160, 3840, seed=s),
                                      0.1, seed=s), 0, 1)
        for s in range(2)
    ])
    return "cfg5_video_2x4k_streaming", _cfg5_recipe(), frames, frames


def row5x():
    """Config 5 at its FULL shape: 16x 4K frames (132.7 MP total) streamed
    through the batched pipeline in 2-frame chunks (one compiled executable
    reused 8x; 16 frames in one step would need ~27 GB of per-frame V
    buffers alone, past single-chip HBM — on a v4-32 the 'data' axis holds
    the whole batch instead of chunking). BASELINE.json config 5's real
    workload, end-to-end on one chip."""
    import graphlap_tpu as gl
    frames = np.stack([
        np.clip(gl.add_gaussian_noise(gl.make_test_image(2160, 3840, seed=s),
                                      0.1, seed=s), 0, 1)
        for s in range(16)
    ])
    return "cfg5_video_16x4k_streaming", _cfg5_recipe(), frames, frames


def row5t():
    """Temporal basis reuse at 4K (models/video._filter_video_guided):
    a STATIC scene (one image, per-frame noise — the regime the feature
    targets) of 8 frames, groups of 4 sharing the mean-frame basis.
    The A/B bar is the same frames through the per-frame-basis batched
    path. Expected: factor stage runs 4x less often AND PSNR improves
    (the mean guide carries sigma/2 of the noise; +1.4 dB measured at
    64^2, tests/test_video.py)."""
    import graphlap_tpu as gl
    img = gl.make_test_image(2160, 3840, seed=0)
    frames = np.stack([
        np.clip(gl.add_gaussian_noise(img, 0.1, seed=s), 0, 1)
        for s in range(8)
    ])
    return "cfg5_video_8x4k_temporal_guide", _cfg5_recipe(), img, frames


def row5tr():
    """Registered temporal guide at 4K under CAMERA PAN (1 px/frame,
    integer crops of one oversized scene so the clean trajectory is
    exact): groups of 4 span 3 px — past the unregistered ~0.5-1 px
    boundary — and register_guide=True must recover the static-scene
    class (the 64^2 calibration: -3.2 -> +1.4 dB vs per-frame bases,
    docs/plots/motion_guide.png)."""
    import graphlap_tpu as gl
    b = 8
    base = gl.make_test_image(2160 + b, 3840 + b, seed=0)
    clean = np.stack([base[t:t + 2160, t:t + 3840] for t in range(b)])
    frames = np.stack([
        np.clip(gl.add_gaussian_noise(clean[t], 0.1, seed=t), 0, 1)
        for t in range(b)
    ]).astype(np.float32)
    return "cfg5_video_8x4k_pan_registered", _cfg5_recipe(), clean, frames


def row5ta():
    """The SAME 1 px/frame pan scene as row5tr, but routed by
    temporal_guide='auto' (VERDICT r4 #5): the router estimates the
    motion and picks the measured-boundary configuration (k=2 registered
    at ~1 px/frame — motion_guide.jsonl) instead of the hand-picked k=4
    that lost both axes in r4. The row records what the router chose."""
    _, cfg, clean, frames = row5tr()
    return "cfg5_video_8x4k_pan_auto", cfg, clean, frames


ROWS = {"1": row1, "2": row2, "3": row3, "3l": row3l, "4": row4, "4c": row4c,
        "4g": row4g, "4m": row4m, "4p": row4p, "4q": row4q, "4x": row4x,
        "5": row5, "5s": row5s, "5t": row5t, "5ta": row5ta, "5tr": row5tr,
        "5x": row5x,
        "6": row6, "6q": row6q, "7": row7, "8": row8}
# per-video-row harness options: chunk size + timed passes (16x4K moves
# ~0.5 GB through this box's remote-TPU tunnel per pass — keep passes low)
VIDEO_ROWS = {"5": {}, "5s": {},
              "5x": {"frames_per_step": 2, "n_runs": 3, "single_bar_frames": 4}}


def _grad_energy(img: np.ndarray) -> float:
    gx = np.diff(img, axis=0)
    gy = np.diff(img, axis=1)
    return float((gx * gx).sum() + (gy * gy).sum())


def _parity_cfg(cfg):
    """The gate-compliant twin of a fast config (f32, full-res Sinkhorn,
    exact gram, XLA ops), or None if cfg is already compliant. Used to
    attach a measured parity bound to every accelerated headline row
    (BASELINE.json metric: 'PSNR delta vs CPU reference' — transitively,
    vs the compliant path that IS oracle-gated in tests)."""
    exact = cfg.replace(affinity_dtype="float32", feature_dtype="float32",
                        sinkhorn_coarse=1, fused_finish=False,
                        sinkhorn_polish=0, gram_coarse=1, gram_dtype="auto",
                        use_pallas=False,
                        # the twin must be CONVERGED full-res Sinkhorn even
                        # when the fast recipe tunes its coarse loop short
                        # (10 iters measured converged: 20 -> 10 moves the
                        # output 0.0003 dB at cfg2)
                        sinkhorn_iters=max(cfg.sinkhorn_iters, 10))
    return None if exact == cfg else exact


def device_wall(image2d, cfg, plan) -> float:
    """Device-only wall: inputs pre-staged, completion synced by pulling a
    4-byte scalar. The end-to-end wall on this box includes ~seconds of
    image upload/download through the remote-TPU tunnel (measured via
    jax.profiler), which real deployments don't pay."""
    import jax
    import jax.numpy as jnp
    from graphlap_tpu.models.pipeline import _filter_channel

    img = jax.device_put(jnp.asarray(image2d, jnp.float32))
    idx_a = jax.device_put(jnp.asarray(plan.idx_a))
    perm = jax.device_put(jnp.asarray(plan.perm))
    inv_perm = jax.device_put(jnp.asarray(plan.inv_perm))
    sync = jax.jit(jnp.sum)
    float(sync(_filter_channel(img, idx_a, perm, inv_perm, cfg)[0]))  # warm
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        z, _ = _filter_channel(img, idx_a, perm, inv_perm, cfg)
        float(sync(z))
        walls.append(time.perf_counter() - t0)
    return min(walls)


def run_row(name, cfg, clean, image):
    import jax
    import graphlap_tpu as gl
    from graphlap_tpu.models.pipeline import make_plan

    plan = make_plan(image, cfg)
    n = plan.n
    t0 = time.perf_counter()
    gl.filter_image(image, cfg, plan=plan)            # compile + warm
    compile_wall = time.perf_counter() - t0
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = gl.filter_image(image, cfg, plan=plan)
        walls.append(time.perf_counter() - t0)
    wall = min(walls)
    dev_wall = device_wall(image if image.ndim == 2 else image[..., 0],
                           cfg, plan)
    channels = 1 if image.ndim == 2 else image.shape[-1]
    mp = n * channels / 1e6

    staged_timings = None
    want_staged = (
        (cfg.streaming and (image.ndim == 2 or cfg.rgb_mode == "per_channel"))
        or (not cfg.streaming and image.ndim == 2
            and max(image.shape[:2]) <= 1024))
    roofline = None
    if want_staged:
        # streaming rows report normalize/eigensolve/filter walls from the
        # staged jits (graded eigensolve metric); dense rows the 4-stage
        # split. Two runs: the first pays stage compiles.
        s = gl.filter_image_staged(image, cfg, plan=plan)
        s = gl.filter_image_staged(image, cfg, plan=plan)
        staged_timings = {k: round(v, 4) for k, v in s.timings.items()}
        # roofline accounting (VERDICT r3 #2): achieved per-stage rates vs
        # the measured device ceilings. Stage walls carry ~30 ms of
        # scalar-readback RTT each — fractions are a lower bound.
        try:
            from graphlap_tpu.utils.roofline import (dense_stage_costs,
                                                     measure_device_peaks,
                                                     roofline_report,
                                                     select_stage_costs,
                                                     streaming_stage_costs,
                                                     strip_cache_stage_costs,
                                                     xla_stage_costs)
            peaks = measure_device_peaks()
            # counts from XLA's cost analysis of the actual stage
            # executables where the HLO is fully counted (loop-free /
            # Pallas full-sweep), analytic model where scans make the
            # HLO count opaque — select_stage_costs documents the rule
            xla = xla_stage_costs(image.shape, cfg, plan)
            d_feat = (cfg.patch_size ** 2 if cfg.kernel == "nlm" else
                      1 + (2 if cfg.spatial_h > 0 else 0))
            analytic = (strip_cache_stage_costs(cfg, n, plan.p, d_feat)
                        if cfg.strip_cache else
                        streaming_stage_costs(cfg, n, plan.p, d_feat)
                        if cfg.streaming else
                        dense_stage_costs(cfg, n, plan.p, d_feat))
            costs, cost_source = select_stage_costs(xla, analytic)
            tile_dt = ("bfloat16" if cfg.affinity_dtype != "float32"
                       else "float32")
            roofline = roofline_report(costs, s.timings, peaks, tile_dt)
            roofline["cost_source"] = cost_source
        except Exception:
            pass

    # measured parity bound for accelerated rows: same pixels through the
    # gate-compliant (f32, full-res Sinkhorn) twin config
    parity = None
    pcfg = _parity_cfg(cfg)
    if pcfg is not None and n >= 32 * 1024 * 1024:
        # the f32 full-res twin consistently faults the device at 32 MP+
        # (4x UNAVAILABLE / remote-compile 500s recorded 2026-08-18,
        # matrix.jsonl) — don't re-stress it every run; the parity chain
        # anchors at the largest twin-feasible scale instead
        parity = {"skipped": "f32-exact twin infeasible on one chip at "
                             "this N; anchored at 8 MP (0.0025 dB vs "
                             "f32-exact) and 384^2 (0.0014 dB vs f64 "
                             "oracle, parity_anchor.jsonl)"}
        pcfg = None
    if pcfg is not None:
        # the twin is a capacity stress of its own at 32 MP+ (f32 features
        # + full-res Sinkhorn); a device fault there must not discard the
        # row's already-measured walls (observed 2026-08-18: row6's timed
        # runs completed, the twin died UNAVAILABLE, nothing was recorded)
        try:
            ref = gl.filter_image(image, pcfg, plan=plan)
            parity = {
                "psnr_vs_f32_db": round(gl.psnr(ref.image, res.image), 2),
                "dpsnr_vs_clean_db": (
                    round(abs(gl.psnr(clean, res.image) - gl.psnr(clean, ref.image)), 4)
                    if image is not clean else None),
            }
        except Exception as e:  # noqa: BLE001 — record, keep the row
            parity = {"error": f"{type(e).__name__}: {str(e)[:160]}"}

    # peak HBM (capacity rows 6/7 substantiate their fit claims with this):
    # runtime memory_stats where the backend has it; on this box's axon
    # plugin (no memory_stats) the compile-time XLA memory_analysis of the
    # row's own executable fills the column (VERDICT r3 #4)
    from graphlap_tpu.utils.meminfo import peak_hbm_gib
    img2d_shape = image.shape[:2]
    peak_hbm, hbm_source = peak_hbm_gib(img2d_shape, cfg, plan)

    rec = {
        "row": name, "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "peak_hbm_gib": peak_hbm, "peak_hbm_source": hbm_source,
        "shape": list(image.shape), "p": plan.p, "m": cfg.num_eigvecs,
        "config_hash": cfg.config_hash(),
        "wall_s": round(wall, 4), "compile_s": round(compile_wall, 2),
        "mp_per_s": round(mp / wall, 4),
        "device_wall_s": round(dev_wall, 4),
        "device_mp_per_s": round((n / 1e6) / dev_wall, 4),
        "staged_timings_s": staged_timings,
        "roofline": roofline,
        "psnr_in_db": round(gl.psnr(clean, image), 3) if image is not clean else None,
        "psnr_out_db": round(gl.psnr(clean, res.image), 3) if image is not clean else None,
        "ssim_out": round(gl.ssim(clean, res.image), 4),
        "grad_energy_ratio": round(_grad_energy(res.image)
                                   / max(_grad_energy(image), 1e-30), 4),
        "parity": parity,
        "ts": time.time(),
    }
    RESULTS.parent.mkdir(parents=True, exist_ok=True)
    with RESULTS.open("a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    return rec


def run_video_row(name, cfg, frames, frames_per_step=None, n_runs=3,
                  single_bar_frames=None):
    import jax
    import graphlap_tpu as gl
    from graphlap_tpu.models.pipeline import make_plan
    from graphlap_tpu.models.video import filter_video
    from graphlap_tpu.parallel.mesh import make_mesh

    plan = make_plan(frames[0], cfg)
    mesh = make_mesh()                      # all local devices
    b = frames.shape[0]
    # streaming: all frames in one jit step (O(B(Nd+p^2)) memory);
    # dense: the per-step strips must fit HBM, cap the batch
    fps = frames_per_step or (b if cfg.streaming else min(b, 2))
    filter_video(frames[:fps], cfg, mesh=mesh, plan=plan,
                 frames_per_step=fps)       # compile + warm
    walls = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        out, _ = filter_video(frames, cfg, mesh=mesh, plan=plan,
                              frames_per_step=fps)
        walls.append(time.perf_counter() - t0)
    wall = min(walls)
    walls_sorted = sorted(walls)
    mp = frames.size / 1e6

    # the bar the batch must beat (VERDICT r1: batching must not subtract
    # value): the same frames through the single-image path, sequentially.
    # Rates compare fairly even if the bar covers a frame subset (the
    # per-frame cost is constant: same shape/plan, executable reused).
    nb = min(single_bar_frames or b, b)
    gl.filter_image(frames[0], cfg, plan=plan)          # warm
    t0 = time.perf_counter()
    for s in range(nb):
        gl.filter_image(frames[s], cfg, plan=plan)
    single_wall = (time.perf_counter() - t0) * (b / nb)

    # device-only wall for ONE chunk (inputs pre-staged, scalar-readback
    # sync): the deployment number — the e2e wall on this box includes
    # tunnel transfers (~0.5 GB per 4K chunk) that local-attached chips
    # don't pay, and at the 16x4K shape those dominate
    dev_mps = None
    if cfg.streaming:
        import jax.numpy as jnp
        from graphlap_tpu.parallel.streaming_sharded import (
            build_streaming_sharded_batch,
        )
        run1 = build_streaming_sharded_batch(mesh, cfg)
        chunk_dev = jax.device_put(jnp.asarray(frames[:fps], jnp.float32))
        idx_dev = jax.device_put(jnp.asarray(plan.idx_a))
        sync = jax.jit(jnp.sum)
        float(sync(run1(chunk_dev, idx_dev)[0]))            # warm
        dwalls = []
        for _ in range(3):
            t0 = time.perf_counter()
            z1, _ = run1(chunk_dev, idx_dev)
            float(sync(z1))
            dwalls.append(time.perf_counter() - t0)
        dev_mps = round((fps * frames[0].size / 1e6) / min(dwalls), 4)

    # graded eigensolve wall, attributed on ONE frame through the staged
    # single-image jits (the batched step fuses everything)
    staged = None
    if cfg.streaming:
        st_res = gl.filter_image_staged(frames[0], cfg, plan=plan)
        st_res = gl.filter_image_staged(frames[0], cfg, plan=plan)
        staged = {k: round(v, 4) for k, v in st_res.timings.items()}

    # compile-time HBM of the batched chunk executable (VERDICT r4 #8:
    # the per-channel pipeline analysis is the wrong executable here)
    peak_hbm = hbm_source = None
    if cfg.streaming:
        from graphlap_tpu.utils.meminfo import video_hbm_analysis
        ma = video_hbm_analysis((fps,) + frames.shape[1:], cfg, plan, mesh)
        if ma is not None and ma["total"] > 0:
            peak_hbm = round(ma["total"] / 2**30, 3)
            hbm_source = "memory_analysis"

    h, w = frames.shape[1:]
    clean = [gl.make_test_image(h, w, seed=s) for s in range(b)]
    rec = {
        "row": name, "backend": jax.default_backend(),
        "device": str(jax.devices()[0]), "shape": list(frames.shape),
        "peak_hbm_gib": peak_hbm, "peak_hbm_source": hbm_source,
        "p": plan.p, "m": cfg.num_eigvecs, "config_hash": cfg.config_hash(),
        "wall_s": round(wall, 4), "mp_per_s": round(mp / wall, 4),
        # run-to-run spread: e2e walls on this box ride the remote-TPU
        # tunnel, whose variance dominates (VERDICT r2 weak 5) — report
        # min/median/max so no single draw overstates the batch effect
        "wall_s_runs": [round(w, 4) for w in walls_sorted],
        "wall_s_median": round(walls_sorted[len(walls_sorted) // 2], 4),
        "device_mp_per_s": dev_mps,
        "staged_timings_per_frame_s": staged,
        "frames_per_step": fps, "single_bar_frames": nb,
        "single_image_path_mp_per_s": round(mp / single_wall, 4),
        "batch_speedup_vs_single": round(single_wall / wall, 3),
        "psnr_in_db": round(float(np.mean([
            gl.psnr(clean[s], frames[s]) for s in range(b)])), 3),
        "psnr_out_db": round(float(np.mean([
            gl.psnr(clean[s], out[s]) for s in range(b)])), 3),
        "ts": time.time(),
    }
    RESULTS.parent.mkdir(parents=True, exist_ok=True)
    with RESULTS.open("a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


def run_video_guided_row(name, cfg, clean_img, frames, k=4, n_runs=2,
                         bar_frames_per_step=2, register=False):
    """Temporal-guide A/B: the SAME static-scene frames through (a) groups
    of ``k`` sharing the mean-frame basis and (b) per-frame bases (the
    production batched path). Both legs move identical bytes through the
    tunnel, so the e2e walls compare fairly on this box."""
    import graphlap_tpu as gl
    from graphlap_tpu.models.pipeline import make_plan
    from graphlap_tpu.models.video import filter_video, route_temporal_guide

    plan = make_plan(frames[0], cfg)
    b = frames.shape[0]
    mp = frames.size / 1e6

    routed = None
    if k == "auto":
        # VERDICT r4 #5: the r4 pan row hand-picked k=4 registered at
        # 1.4 px/frame — a both-lose configuration. The production router
        # (models/video.route_temporal_guide, measured motion_guide.jsonl
        # boundaries) picks the group size from estimated motion, or
        # DECLINES guided reuse (k=1) past the boundary. This row records
        # what the router chose and A/Bs the routed configuration.
        k, register = route_temporal_guide(frames, register=register)
        routed = {"routed_k": k, "routed_register": register}
        if k == 1:
            import jax
            rec = {
                "row": name, "backend": jax.default_backend(),
                "device": str(jax.devices()[0]),
                "shape": list(frames.shape), "p": plan.p,
                "m": cfg.num_eigvecs, "config_hash": cfg.config_hash(),
                "temporal_guide": "auto", **routed,
                "guided_declined": True,
                "note": "router declined guided reuse for this motion "
                        "regime (falls back to per-frame bases with a "
                        "warning) — the r4 both-lose row is unreachable "
                        "through temporal_guide='auto'",
                "ts": time.time(),
            }
            RESULTS.parent.mkdir(parents=True, exist_ok=True)
            with RESULTS.open("a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec))
            return

    filter_video(frames[:k], cfg, plan=plan, temporal_guide=k,
                 register_guide=register)                            # warm
    gwalls = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        zg, _ = filter_video(frames, cfg, plan=plan, temporal_guide=k,
                             register_guide=register)
        gwalls.append(time.perf_counter() - t0)

    fps = min(bar_frames_per_step, b)
    filter_video(frames[:fps], cfg, plan=plan, frames_per_step=fps)  # warm
    iwalls = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        zi, _ = filter_video(frames, cfg, plan=plan, frames_per_step=fps)
        iwalls.append(time.perf_counter() - t0)

    import jax
    # clean may be one static image or a per-frame trajectory stack
    cref = (lambda s: clean_img) if clean_img.ndim == 2 else \
        (lambda s: clean_img[s])
    psnr_g = float(np.mean([gl.psnr(cref(s), zg[s]) for s in range(b)]))
    psnr_i = float(np.mean([gl.psnr(cref(s), zi[s]) for s in range(b)]))
    psnr_n = float(np.mean([gl.psnr(cref(s), frames[s]) for s in range(b)]))
    rec = {
        "row": name, "backend": jax.default_backend(),
        "device": str(jax.devices()[0]), "shape": list(frames.shape),
        "p": plan.p, "m": cfg.num_eigvecs, "config_hash": cfg.config_hash(),
        "temporal_guide": k, "register_guide": register,
        **(routed or {}),
        "wall_guided_s": [round(w, 4) for w in sorted(gwalls)],
        "wall_per_frame_s": [round(w, 4) for w in sorted(iwalls)],
        "guided_speedup": round(min(iwalls) / min(gwalls), 3),
        "mp_per_s_guided": round(mp / min(gwalls), 4),
        "psnr_in_db": round(psnr_n, 3),
        "psnr_guided_db": round(psnr_g, 3),
        "psnr_per_frame_db": round(psnr_i, 3),
        "ts": time.time(),
    }
    RESULTS.parent.mkdir(parents=True, exist_ok=True)
    with RESULTS.open("a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


GUIDED_ROWS = {"5t": {"k": 4, "n_runs": 2},
               "5tr": {"k": 4, "n_runs": 2, "register": True},
               "5ta": {"k": "auto", "n_runs": 2, "register": True}}
TILED_ROWS = {"8": {"tile": 4096, "overlap": 256}}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("rows", nargs="*", default=list(ROWS))
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        setup_compilation_cache(Path(__file__).parent.parent, cpu=True)
    for r in args.rows:
        name, cfg, clean, image = ROWS[r]()
        if r in TILED_ROWS:
            run_tiled_row(name, cfg, clean, image, **TILED_ROWS[r])
        elif r in GUIDED_ROWS:
            run_video_guided_row(name, cfg, clean, image, **GUIDED_ROWS[r])
        elif r in VIDEO_ROWS:
            run_video_row(name, cfg, image, **VIDEO_ROWS[r])
        else:
            run_row(name, cfg, clean, image)


if __name__ == "__main__":
    main()
