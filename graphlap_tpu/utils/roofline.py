"""Roofline / MFU accounting (VERDICT r3 #2; SURVEY.md §6 metric note).

Turns claims like "the streaming passes are VPU exp-bound" into numbers:

* ``measure_device_peaks()`` micro-benchmarks THIS device's attainable
  ceilings — bf16/f32 MXU FLOP/s, elementwise-exp throughput (the VPU
  transcendental rate that bounds every kernel-recompute pass), and HBM
  stream bandwidth — and caches them per device kind. Measured, not
  quoted from a datasheet: the datasheet bf16 peak (197 TFLOP/s on v5e)
  assumes shapes/layouts a real program may not reach, and there is no
  published "exp/s" number at all.

* ``streaming_stage_costs()`` / ``dense_stage_costs()`` give analytic
  per-stage op counts (transcendentals, MXU FLOPs by dtype, HBM bytes)
  for the production recipes. The per-pass counts mirror the Pallas
  kernels' ``CostEstimate``s (ops/pallas_streaming.py): a full kernel
  sweep over (p, N) costs ~2*p*N*(d+1) FLOPs + p*N exps.

* ``roofline_report()`` divides measured stage walls by the counts and
  expresses each rate as a fraction of the measured ceiling; the max
  fraction names the stage's binding resource.

Used by bench.py (cfg2 extras) and benchmarks/run.py (matrix rows); the
headline fractions are quoted in BASELINE.md.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

_PEAKS_CACHE = (Path(__file__).resolve().parents[2] / "benchmarks"
                / "results" / "device_peaks.json")


# ---------------------------------------------------------------------------
# measured ceilings
# ---------------------------------------------------------------------------

def _timed(fn, *args, runs=5, rtt=0.0):
    """min wall of fn(*args) with a SCALAR-READBACK sync: on this box's
    remote-TPU tunnel ``block_until_ready`` returns before the computation
    finishes (the same trap bench.py's device_only_wall works around), so
    every micro-bench reduces its output to a scalar inside the jit and
    the timing pulls that 4-byte scalar to the host. ``rtt`` (the measured
    null round-trip of the sync itself) is subtracted."""
    float(fn(*args))                      # compile + warm
    walls = []
    for _ in range(runs):
        t0 = time.perf_counter()
        float(fn(*args))
        walls.append(time.perf_counter() - t0)
    return max(min(walls) - rtt, 1e-9)


def measure_device_peaks(force: bool = False, cache: Path | None = None) -> dict:
    """Micro-benchmark the current default device's attainable ceilings.

    Returns/caches: {device_kind, bf16_matmul_tflops, f32_matmul_tflops,
    exp_f32_g_per_s, exp_bf16_g_per_s, hbm_stream_gbs, ts}. The exp rate
    is the two-chain-length difference of fused unrolled exp chains (RTT-
    and HBM-free — see the inline note); the matmul peaks use an 8192^3
    GEMM chain (bf16 inputs need precision='default' — Mosaic/XLA reject
    bf16 at the repo-pinned HIGHEST). Every bench is synced by scalar
    readback (see _timed) with the null RTT subtracted.
    """
    import jax
    import jax.numpy as jnp

    cache = cache or _PEAKS_CACHE
    kind = jax.devices()[0].device_kind
    if cache.exists() and not force:
        try:
            rec = json.loads(cache.read_text())
            if rec.get("device_kind") == kind:
                return rec
        except Exception:
            pass

    # null RTT of the scalar-readback sync itself. On this box it measures
    # ~30 ms (the remote-TPU tunnel), so every bench below runs a DEPENDENT
    # chain sized to >= ~10x RTT of device work.
    tiny = jnp.zeros((8,), jnp.float32)
    rtt_j = jax.jit(jnp.sum)
    rtt = _timed(lambda v: rtt_j(v), tiny, runs=9)

    s = 8192
    key = jax.random.PRNGKey(0)
    a32 = jax.random.normal(key, (s, s), jnp.float32) * (s ** -0.5)
    b32 = jax.random.normal(key, (s, s), jnp.float32) * (s ** -0.5)
    a16, b16 = a32.astype(jnp.bfloat16), b32.astype(jnp.bfloat16)
    mm_chain = 64

    # pure GEMM chain: accumulate straight into the operand dtype so no
    # epilogue (astype / rescale) rides the loop. Norm growth is ~2x per
    # iteration (random b at unit scale), well inside the shared 8-bit
    # exponent range of f32 AND bf16 for 64 iterations.
    def _mmchain(a, b, prec, dt):
        def body(_, c):
            return jnp.dot(c, b, preferred_element_type=dt, precision=prec)
        return jnp.sum(jax.lax.fori_loop(0, mm_chain, body, a)
                       .astype(jnp.float32))

    mm16 = jax.jit(lambda a, b: _mmchain(a, b, "default", jnp.bfloat16))
    mm32 = jax.jit(lambda a, b: _mmchain(a, b, "highest", jnp.float32))
    t16 = _timed(mm16, a16, b16, rtt=rtt)
    t32 = _timed(mm32, a32, b32, rtt=rtt)
    flops = 2.0 * s * s * s * mm_chain

    # exp throughput: statically UNROLLED dependent chains, so the exps
    # fuse into one kernel and the array makes ONE HBM round trip; the
    # rate is taken from the DIFFERENCE of two chain lengths, which
    # cancels the RTT, dispatch, and HBM-trip constants exactly. (The
    # previous fori_loop form round-tripped the carry through HBM every
    # iteration — the "exp peak" it measured was the HBM roofline in
    # disguise, and real fused kernels measured >1x "peak". A lone
    # absolute chain is no better: at ~3.5 Texp/s the whole chain is
    # ~5 ms of device work vs ~30 ms tunnel RTT on this box. Chains stay
    # <= 512 unrolled ops — past that XLA's fusion splits and the wall
    # jumps 10x. exp(-x) of non-negative input stays in [0, 1].)
    ne = 1 << 27            # 512 MB f32: diff window ~15-30 ms >> jitter
    x32 = jnp.abs(jax.random.normal(key, (ne,), jnp.float32))
    x16 = x32.astype(jnp.bfloat16)
    c_lo, c_hi = 64, 448

    def _expchain(chain):
        def f(x):
            for _ in range(chain):
                x = jnp.exp(-x)
            return jnp.sum(x.astype(jnp.float32))
        return jax.jit(f)

    lo_j, hi_j = _expchain(c_lo), _expchain(c_hi)
    te32 = max(_timed(hi_j, x32) - _timed(lo_j, x32), 1e-9)
    te16 = max(_timed(hi_j, x16) - _timed(lo_j, x16), 1e-9)
    exp_ops = (c_hi - c_lo) * ne

    # composite distance-epilogue rate: what a kernel-recompute pass
    # actually does per element AFTER its cross GEMM — d2 = max(norms -
    # 2*cross, 0), then exp(-d2) (pallas_streaming._kb_tile). Measured
    # RESULT on v5e: ~1.45 T/s, within 4% of the pure-exp rate — the exp
    # dominates the epilogue and the extra VPU ops ride along free-ish.
    # Kept as its own ceiling because it is the workload-faithful one
    # (future hardware may not have that property). Same two-chain-
    # difference method; the chain stays bounded (x in [0, 1] => d2 in
    # [0, 1.5] => exp(-d2) in [0.22, 1]). SHORTER chains than the
    # pure-exp bench: each link is ~5 ops, and a 448-link version blew
    # XLA's fusion budget into split kernels with HBM round trips (first
    # measurement: a bogus 88 G/s, 16x under exp).
    dc_lo, dc_hi = 16, 80

    def _d2expchain(chain):
        def f(x):
            for _ in range(chain):
                x = jnp.exp(-jnp.maximum(1.5 - 2.0 * x, 0.0))
            return jnp.sum(x.astype(jnp.float32))
        return jax.jit(f)

    dlo_j, dhi_j = _d2expchain(dc_lo), _d2expchain(dc_hi)
    td32 = max(_timed(dhi_j, x32) - _timed(dlo_j, x32), 1e-9)
    d2exp_ops = (dc_hi - dc_lo) * ne

    # HBM read-stream: the scalar carry dependence forces a fresh 4-byte
    # read per element per iteration (a READ-bandwidth ceiling — what the
    # strip-reading passes are bound by); the +acc*eps prevents CSE.
    nb = 1 << 29
    hbm_iters = 32
    xb = jnp.zeros(nb, jnp.float32)

    def _hbmchain(v):
        def body(_, acc):
            return acc + jnp.sum(v + acc * 1e-30)
        return jax.lax.fori_loop(0, hbm_iters, body, jnp.float32(0.0))

    add_j = jax.jit(_hbmchain)
    tb = _timed(add_j, xb, rtt=rtt)

    rec = {
        "device_kind": kind,
        "sync_rtt_s": round(rtt, 5),
        "bf16_matmul_tflops": round(flops / t16 / 1e12, 1),
        "f32_matmul_tflops": round(flops / t32 / 1e12, 1),
        "exp_f32_g_per_s": round(exp_ops / te32 / 1e9, 2),
        "exp_bf16_g_per_s": round(exp_ops / te16 / 1e9, 2),
        "d2exp_g_per_s": round(d2exp_ops / td32 / 1e9, 2),
        "hbm_stream_gbs": round(4.0 * nb * hbm_iters / tb / 1e9, 1),
        "ts": time.time(),
    }
    try:
        cache.parent.mkdir(parents=True, exist_ok=True)
        cache.write_text(json.dumps(rec, indent=2))
    except OSError:
        pass
    return rec


# ---------------------------------------------------------------------------
# analytic per-stage op counts
# ---------------------------------------------------------------------------

def _pass_cost(p: int, cols: int, d: int, extra_dot_width: int = 1) -> dict:
    """One kernel-recompute sweep over ``cols`` columns: the distance GEMM
    (2*p*cols*d), the exp (p*cols transcendentals), and the consuming
    dot(s) of total width ``extra_dot_width`` (2*p*cols*w). Matches the
    Pallas CostEstimates' 2*p*n*(d + w) form."""
    return {"trans": p * cols,
            "mxu_flops": 2.0 * p * cols * (d + extra_dot_width),
            "hbm_bytes": 0.0}


def _add(a: dict, b: dict, scale: float = 1.0) -> dict:
    return {k: a.get(k, 0.0) + scale * b.get(k, 0.0)
            for k in set(a) | set(b)}


def streaming_stage_costs(cfg, n: int, p: int, d: int) -> dict:
    """Per-stage op counts for the streaming spectral path (unfused
    schedule — what filter_image_staged walls attribute; the fused-finish
    headline collapses the same sweeps, so the TOTAL is an upper bound of
    ~one pass on the fused wall). Keys match staged timing names."""
    m = cfg.num_eigvecs
    ks, kg = cfg.sinkhorn_coarse, cfg.gram_coarse
    it, pol = cfg.sinkhorn_iters, cfg.sinkhorn_polish

    zero = {"trans": 0.0, "mxu_flops": 0.0, "hbm_bytes": 0.0}

    norm = dict(zero)
    if cfg.normalization == "sinkhorn" and ks > 1:
        norm = _add(norm, _pass_cost(p, n // ks, d))            # u0
        # per iter: two coarse contraction steps (each one tile recompute
        # with TWO consuming dots) + p^2 solves (4 triangular/apply ops)
        per_it = _add(_pass_cost(p, n // ks, d, 2),
                      _pass_cost(p, n // ks, d, 2))
        per_it = _add(per_it, {"mxu_flops": 8.0 * p * p})
        norm = _add(norm, per_it, it)
        norm = _add(norm, _pass_cost(p, n, d, 2))               # rmatvec2 ext
        # each polish iteration: ktilde_apply = matvec + rmatvec full passes
        norm = _add(norm, _add(_pass_cost(p, n, d), _pass_cost(p, n, d)), pol)
    elif cfg.normalization == "sinkhorn":
        norm = _add(norm, _add(_pass_cost(p, n, d), _pass_cost(p, n, d)), it)
    elif cfg.normalization == "symmetric":
        norm = _add(norm, _add(_pass_cost(p, n, d), _pass_cost(p, n, d)))

    eig = dict(zero)
    # gram over n/kg columns: distance GEMM + p-wide self outer product
    eig = _add(eig, {"trans": p * (n // kg),
                     "mxu_flops": 2.0 * p * (n // kg) * d
                     + 2.0 * p * p * (n // kg)})
    # p x p factor: chol ~ p^3/3 + lobpcg-class iterations O(p^2 m)
    eig = _add(eig, {"mxu_flops": p ** 3 / 3.0
                     + (2.0 * p * p * m * cfg.lobpcg_iters
                        if cfg.solver == "lobpcg" else 2.0 * p ** 3)})
    # colstats(+V): one full sweep, m-wide consumer
    eig = _add(eig, _pass_cost(p, n, d, m))
    if n * m * 4 <= 6e9:                     # V materialized (_V_BYTES_CAP)
        eig = _add(eig, {"hbm_bytes": 4.0 * n * m})

    if cfg.operator_filter():
        # matvec mode: no eigensolve stage; the filter IS ktilde applies
        # (each = one rmatvec + one matvec full recompute sweep), one per
        # polynomial degree of f (ops/filters.MATVEC_FILTERS)
        deg = {"identity": 1, "sharpen": 1, "twicing": 2}.get(
            cfg.filter_name, None)
        if deg is None:
            deg = (int(cfg.filter_param) if cfg.filter_name == "power"
                   else cfg.cheb_degree)
        per_apply = _add(_pass_cost(p, n, d), _pass_cost(p, n, d))
        per_apply = _add(per_apply, {"mxu_flops": 2.0 * p * p})  # solve
        return {"normalize": norm,
                "filter": _add(dict(zero), per_apply, max(deg, 1))}

    filt = dict(zero)
    if n * m * 4 <= 6e9:
        filt = _add(filt, {"mxu_flops": 2.0 * n * m,
                           "hbm_bytes": 4.0 * n * m})
    else:
        filt = _add(filt, _pass_cost(p, n, d))                   # rmat_apply

    return {"normalize": norm, "eigensolve": eig, "filter": filt}


def dense_stage_costs(cfg, n: int, p: int, d: int) -> dict:
    """Per-stage op counts for the DENSE (materialized-strip) path at the
    cfg2 production recipe. The strip is written once (affinity) and every
    later pass READS it — HBM bytes are the load there, not recompute."""
    m = cfg.num_eigvecs
    ks = cfg.sinkhorn_coarse
    it, pol = cfg.sinkhorn_iters, cfg.sinkhorn_polish
    itemsize = 2 if cfg.affinity_dtype in ("bfloat16", "bfloat16_store") else 4
    strip = float(p) * n * itemsize

    aff = {"trans": float(p) * n, "mxu_flops": 2.0 * p * n * d,
           "hbm_bytes": strip}                                   # write-out

    norm = {"trans": 0.0, "mxu_flops": 0.0, "hbm_bytes": 0.0}
    if cfg.normalization == "sinkhorn" and ks > 1:
        # coarse loop reads the 1/ks column slice twice per iteration
        per_it = {"mxu_flops": 2.0 * 2.0 * p * (n // ks) + 8.0 * p * p,
                  "hbm_bytes": 2.0 * strip / ks}
        norm = _add(norm, per_it, it)
        norm = _add(norm, {"mxu_flops": 2.0 * 2.0 * p * n,      # extension
                           "hbm_bytes": strip})
        norm = _add(norm, {"mxu_flops": 2.0 * 2.0 * 2.0 * p * n,
                           "hbm_bytes": 2.0 * strip}, pol)      # polish
    elif cfg.normalization == "sinkhorn":
        norm = _add(norm, {"mxu_flops": 2.0 * 2.0 * 2.0 * p * n,
                           "hbm_bytes": 2.0 * strip}, it)

    if cfg.operator_filter():
        # matvec mode: each ktilde apply reads the strip twice (rmatvec +
        # matvec) and does the p x p completion solve; one per degree
        deg = {"identity": 1, "sharpen": 1, "twicing": 2}.get(
            cfg.filter_name, None)
        if deg is None:
            deg = (int(cfg.filter_param) if cfg.filter_name == "power"
                   else cfg.cheb_degree)
        per_apply = {"trans": 0.0, "mxu_flops": 2.0 * 2.0 * p * n + 2.0 * p * p,
                     "hbm_bytes": 2.0 * strip}
        filt = _add({"trans": 0.0, "mxu_flops": 0.0, "hbm_bytes": 0.0},
                    per_apply, max(deg, 1))
        return {"affinity": aff, "normalize": norm, "filter": filt}

    eig = {"trans": 0.0, "mxu_flops": 0.0, "hbm_bytes": 0.0}
    if cfg.solver == "sketch":
        k = m + cfg.sketch_oversample
        npass = 2 + 2 * cfg.sketch_power     # W^T Omega, W Y per power step
        eig = _add(eig, {"mxu_flops": npass * 2.0 * p * n * k,
                         "hbm_bytes": npass * strip})
        eig = _add(eig, {"mxu_flops": 8.0 * p * k * k})          # QR + small
    else:
        eig = _add(eig, {"mxu_flops": 2.0 * p * p * n, "hbm_bytes": strip})
        eig = _add(eig, {"mxu_flops": p ** 3 / 3.0
                         + (2.0 * p * p * m * cfg.lobpcg_iters
                            if cfg.solver == "lobpcg" else 2.0 * p ** 3)})

    # extension GEMM (N, p) @ (p, m) + the O(Nm) apply
    filt = {"trans": 0.0,
            "mxu_flops": 2.0 * float(n) * p * m + 4.0 * n * m,
            "hbm_bytes": strip + 4.0 * n * m}
    return {"affinity": aff, "normalize": norm, "eigensolve": eig,
            "filter": filt}


def strip_cache_stage_costs(cfg, n: int, p: int, d: int) -> dict:
    """Per-stage op counts for the strip_cache recipe (streaming model,
    materialized natural-order strip — the r4 cfg2 headline). Keys match
    the STREAMING staged timing names (normalize/eigensolve/filter): the
    strip emit lands in ``normalize`` because stage_scales_streaming
    builds the ctx first; the staged eigensolve/filter walls each rebuild
    the ctx (re-emit), so their fractions are lower bounds — the fused
    headline emits once."""
    dense = dense_stage_costs(cfg, n, p, d)
    m = cfg.num_eigvecs
    if cfg.operator_filter():
        # matvec mode: strip emit folds into normalize; applies read the
        # cached strip (the dense model's filter entry already says so)
        return {"normalize": _add(dense["affinity"], dense["normalize"]),
                "filter": dense["filter"]}
    out = {"normalize": _add(dense["affinity"], dense["normalize"]),
           "eigensolve": dense["eigensolve"]}
    itemsize = 2 if cfg.affinity_dtype in ("bfloat16", "bfloat16_store") else 4
    strip = float(p) * n * itemsize
    # strip-backed colstats (one strip read, m-wide) + the O(Nm) apply
    out["eigensolve"] = _add(out["eigensolve"],
                             {"mxu_flops": 2.0 * float(n) * p * m,
                              "hbm_bytes": strip + 4.0 * n * m})
    out["filter"] = {"trans": 0.0, "mxu_flops": 2.0 * n * m,
                     "hbm_bytes": 4.0 * n * m}
    return out


# ---------------------------------------------------------------------------
# XLA-derived per-stage op counts (authoritative over the analytic models)
# ---------------------------------------------------------------------------

def _ca_costs(lowered) -> dict:
    """flops / transcendentals / bytes-accessed of one lowered stage, from
    XLA's HloCostAnalysis of the OPTIMIZED module (post-fusion, so the
    bytes figure approximates true HBM traffic, not per-op operand sums
    of values that never leave VMEM)."""
    ca = lowered.compile().cost_analysis()
    d = ca[0] if isinstance(ca, (list, tuple)) else ca
    return {"trans": float(d.get("transcendentals", 0.0)),
            "mxu_flops": float(d.get("flops", 0.0)),
            "hbm_bytes": float(d.get("bytes accessed", 0.0))}


def xla_stage_costs(image_shape, cfg, plan) -> dict | None:
    """Per-stage op counts extracted from XLA's cost analysis of THIS
    config's compiled stage executables (the same jits whose walls
    filter_image_staged reports).

    The round-3 analytic models (streaming/dense/strip_cache_stage_costs)
    hand-maintain the counts and drifted from the implementation — e.g.
    they charged the >6 GB-V streaming filter stage a full-resolution
    recompute pass the code replaced with a decimated apply, producing
    frac_of_roofline > 1 in committed matrix rows. This derives the counts
    from the optimized HLO instead, so they track the code by
    construction. Lowering uses ShapeDtypeStructs (no data movement);
    compiles hit the jit/persistent cache when the row already ran staged.
    Returns None (callers fall back to the analytic model) on any failure.
    """
    import jax
    import jax.numpy as jnp

    from ..models import pipeline as P

    h, w = image_shape[:2]
    img = jax.ShapeDtypeStruct((h, w), jnp.float32)
    idx = jax.ShapeDtypeStruct(plan.idx_a.shape, plan.idx_a.dtype)
    try:
        if cfg.streaming:
            from ..models import streaming as S
            s_sh = jax.eval_shape(S.stage_scales_streaming, img, idx, cfg)
            costs = {"normalize":
                     _ca_costs(S.stage_scales_streaming.lower(img, idx, cfg))}
            if cfg.operator_filter():
                # staged matvec mode books the whole apply under "filter"
                costs["filter"] = _ca_costs(
                    S.stage_matvec_streaming.lower(img, idx, s_sh, cfg))
            else:
                fac_sh = jax.eval_shape(
                    S.stage_factor_streaming, img, idx, s_sh, cfg)
                costs["eigensolve"] = _ca_costs(
                    S.stage_factor_streaming.lower(img, idx, s_sh, cfg))
                n = h * w
                n_arrays = len(S.StreamFactor._fields) - 2
                fn = S._stage_apply_jit(cfg, n, min(cfg.block_cols, n), h, w)
                costs["filter"] = _ca_costs(
                    fn.lower(tuple(fac_sh[:n_arrays]), idx))
        else:
            perm = jax.ShapeDtypeStruct(plan.perm.shape, plan.perm.dtype)
            kaa, kab = jax.eval_shape(P._stage_affinity, img, idx, perm, cfg)
            costs = {"affinity":
                     _ca_costs(P._stage_affinity.lower(img, idx, perm, cfg))}
            if cfg.operator_filter():
                s_sh = jax.eval_shape(P._stage_normalize_scales,
                                      kaa, kab, cfg)
                costs["normalize"] = _ca_costs(
                    P._stage_normalize_scales.lower(kaa, kab, cfg))
                costs["filter"] = _ca_costs(P._stage_matvec_filter.lower(
                    img, kaa, kab, *s_sh, perm, perm, cfg))
            else:
                waa, wab = jax.eval_shape(P._stage_normalize, kaa, kab, cfg)
                costs["normalize"] = _ca_costs(
                    P._stage_normalize.lower(kaa, kab, cfg))
                basis_sh = jax.eval_shape(P._stage_eigh, waa, wab, cfg)
                costs["eigensolve"] = _ca_costs(
                    P._stage_eigh.lower(waa, wab, cfg))
                costs["filter"] = _ca_costs(P._stage_filter.lower(
                    img, basis_sh.vals, basis_sh.vecs, perm, perm, cfg))
        return costs
    except Exception:
        return None


def select_stage_costs(xla: dict | None, analytic: dict) -> tuple[dict, dict]:
    """Per-stage choice between XLA-derived and analytic counts.

    The XLA counts are exact for loop-free programs and for Pallas
    full-sweep kernels (their author CostEstimates cover the whole grid),
    but this backend's HloCostAnalysis counts a while/scan BODY ONCE —
    the 32/64 MP rows' lax.scan passes undercount by the trip count
    (~N/block, measured: a 2-full-pass stage reported ~one block's
    transcendentals). When the HLO-counted work is a small fraction of
    the model's, the stage is loop-carried: trust the model there.
    Returns (costs, per-stage source tags).
    """
    if xla is None:
        return analytic, {k: "analytic" for k in analytic}
    out, src = {}, {}
    for stage, a in analytic.items():
        x = xla.get(stage)
        if x is None:
            out[stage], src[stage] = a, "analytic"
            continue
        opaque = ((a["trans"] > 0 and x["trans"] < 0.25 * a["trans"])
                  or (a["mxu_flops"] > 0
                      and x["mxu_flops"] < 0.25 * a["mxu_flops"]))
        out[stage] = a if opaque else x
        src[stage] = "analytic(scan-opaque-hlo)" if opaque else "xla"
    for stage, x in xla.items():          # stages the model doesn't cover
        if stage not in out:
            out[stage], src[stage] = x, "xla"
    return out, src


# ---------------------------------------------------------------------------
# report
# ---------------------------------------------------------------------------

def roofline_report(costs: dict, walls: dict, peaks: dict,
                    tile_dtype: str = "bfloat16") -> dict:
    """Per-stage achieved rates vs the measured ceilings.

    For each stage present in both ``costs`` and ``walls``: achieved
    Gexp/s, TFLOP/s, GB/s, and each as a fraction of the measured peak;
    ``bound`` names the resource with the highest fraction (the roofline
    verdict for that stage)."""
    mm_peak = peaks["bf16_matmul_tflops" if tile_dtype == "bfloat16"
                    else "f32_matmul_tflops"] * 1e12
    exp_peak = peaks["exp_bf16_g_per_s" if tile_dtype == "bfloat16"
                     else "exp_f32_g_per_s"] * 1e9
    hbm_peak = peaks["hbm_stream_gbs"] * 1e9

    d2exp_peak = peaks.get("d2exp_g_per_s", 0) * 1e9

    out = {}
    for stage, c in costs.items():
        w = walls.get(stage)
        if not w or w <= 0:
            continue
        fr = {
            "exp": c["trans"] / w / exp_peak,
            "mxu": c["mxu_flops"] / w / mm_peak,
            "hbm": c["hbm_bytes"] / w / hbm_peak,
        }
        if d2exp_peak:
            # every transcendental in these pipelines arrives through the
            # distance epilogue (d2 build + exp share the VPU) — the
            # workload-faithful per-element ceiling (measured within 4%
            # of pure exp on v5e: the exp dominates its epilogue)
            fr["d2exp"] = c["trans"] / w / d2exp_peak
        bound = max(fr, key=fr.get)
        out[stage] = {
            "wall_s": round(w, 4),
            "gexp_per_s": round(c["trans"] / w / 1e9, 1),
            "tflops": round(c["mxu_flops"] / w / 1e12, 2),
            "gbs": round(c["hbm_bytes"] / w / 1e9, 1),
            "frac_exp_peak": round(fr["exp"], 3),
            "frac_mxu_peak": round(fr["mxu"], 3),
            "frac_hbm_peak": round(fr["hbm"], 3),
            "bound": bound,
            "frac_of_roofline": round(fr[bound], 3),
        }
        if d2exp_peak:
            out[stage]["frac_d2exp_peak"] = round(fr["d2exp"], 3)
    return out
