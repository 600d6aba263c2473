"""Fused Pallas affinity kernel: patch-distance GEMM + exp epilogue.

TPU-native equivalent of the reference's per-row kernel-evaluation loop
(SURVEY.md §2.2 #4, §3.2) and the north-star's "fused Pallas kernels
emitting K_AA/K_AB blocks directly in HBM". The jnp path computes the
(p, N) distance GEMM as an XLA dot custom-call and then a SEPARATE
elementwise kernel for ``exp(-d2)`` — one extra full HBM round trip of the
strip (2 x 5.4 GB at config 2). Here the exp fuses into the matmul epilogue:
each (TILE_P, TILE_N) tile does

    cross = a_tile @ b_tile            (MXU, f32 accumulate)
    d2    = |a|^2 + |b|^2 - 2 cross    (VPU, norms recomputed in-tile)
    out   = exp(-d2)                   (VPU)

and the tile is written to HBM exactly once.

Layout: features are zero-padded host-side to (p_pad, D) and (D, n_pad)
with D = the feature dim padded to the 32-sublane tile (32 for NLM 5x5;
D_PAD=128 caps it and still covers NLM 7x7 + bilateral). 32 rather than a
full 128-lane MXU block for the same reason as the streaming kernels
(ops/pallas_streaming.py module docstring): the transposed copy is 1.28x
the feature data instead of 5.1x, and the skinny-K cross GEMM costs the
MXU no more than the zero-padded K=128 one. Zero padding is exact: pad
feature columns contribute 0 to norms and dots; pad rows/cols are sliced
away by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_streaming import VMEM_LIMIT_BYTES

D_PAD = 128      # contraction depth (feature dim padded)
# Emitter tiles, retuned under the raised 64 MB scoped-VMEM limit
# (pallas_streaming.VMEM_LIMIT_BYTES; benchmarks/sweep_emit_tiles.py ->
# vmem_tiles.jsonl emit rows): the original (128, 512) — sized for
# Mosaic's default 16 MB — needed ~21k grid steps at the cfg2 strip
# shape, and per-step overhead dominated a pass whose pure HBM-write
# floor is ~4 ms. (512, 2048) measures 0.0428 -> 0.0361 s at cfg2 and
# 0.0802 -> 0.0641 at the cfg3 channel shape (sync-walled incl. ~31 ms
# RTT — the device compute roughly halves). Wider tp pads more sample
# rows (p_pad 5248 -> 5632 at cfg2) — the padded rows are sliced off by
# the caller and cost only emit FLOPs, already in the measurement.
TILE_P = 512     # sample-row tile
TILE_N = 2048    # pixel-column tile


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _affinity_kernel(a_ref, b_ref, out_ref):
    a = a_ref[:]                                   # (TILE_P, D)
    b = b_ref[:]                                   # (D, TILE_N)
    # bf16 inputs must use DEFAULT precision: Mosaic rejects a bf16 matmul
    # carrying the package-wide HIGHEST contract precision ("Bad lhs type");
    # bf16 x bf16 -> f32 accumulate is already exactly one MXU pass.
    prec = ("default" if a.dtype == jnp.bfloat16 else "highest")
    cross = jnp.dot(a, b, preferred_element_type=jnp.float32, precision=prec)
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    na = jnp.sum(af * af, axis=1, keepdims=True)   # (TILE_P, 1)
    nb = jnp.sum(bf * bf, axis=0, keepdims=True)   # (1, TILE_N)
    d2 = jnp.maximum(na + nb - 2.0 * cross, 0.0)
    out_ref[:] = jnp.exp(-d2).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dtype", "store_dtype",
                                             "interpret"))
def affinity_strip_pallas(feats_a: jnp.ndarray, feats_all: jnp.ndarray,
                          dtype=jnp.float32, store_dtype=None,
                          interpret: bool | None = None):
    """K strip (p, N) = exp(-|f_Ai - f_j|^2), fused tile emitter.

    Drop-in for ops.affinity.affinity_strip at f32/bfloat16_store; in
    plain bf16 mode the NORMS here come from the bf16-ROUNDED tiles
    (in-tile recompute) while the XLA twin uses f32-feature norms — a
    deliberate divergence, not an oversight: the streaming production
    kernels (pallas_streaming._kb_tile) share this structure and measure
    gate-compliant (0.0014-0.0025 dB), and plain bf16 on the DENSE strip
    is documented-noncompliant regardless (0.135 dB GEMM-trick
    cancellation — BASELINE.md; bfloat16_store supersedes it).
    ``dtype`` controls the GEMM input precision (bf16 inputs -> native
    MXU passes, f32 accumulate); ``store_dtype`` narrows only the
    EMITTED tile (bfloat16_store policy).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    import numpy as np
    out_dtype = np.dtype(store_dtype if store_dtype is not None
                         else jnp.float32)
    p, d = feats_a.shape
    n = feats_all.shape[0]
    if d > D_PAD:
        raise ValueError(f"feature dim {d} > {D_PAD}; widen D_PAD / add k-loop")
    dp = max(32, _cdiv(d, 32) * 32)

    p_pad = _cdiv(p, TILE_P) * TILE_P
    n_pad = _cdiv(n, TILE_N) * TILE_N

    a = jnp.zeros((p_pad, dp), dtype).at[:p, :d].set(feats_a.astype(dtype))
    bt = jnp.zeros((dp, n_pad), dtype).at[:d, :n].set(
        feats_all.astype(dtype).T)

    grid = (p_pad // TILE_P, n_pad // TILE_N)
    out = pl.pallas_call(
        _affinity_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_P, dp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, TILE_N), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_P, TILE_N), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p_pad, n_pad), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * p_pad * n_pad * dp,
            bytes_accessed=(p_pad * dp + dp * n_pad) * a.dtype.itemsize
            + p_pad * n_pad * out_dtype.itemsize,
            transcendentals=p_pad * n_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(a, bt)
    return out[:p, :n]
