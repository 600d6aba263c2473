"""Nystrom eigendecomposition with one-shot orthogonalization.

TPU-native equivalent of the reference's SLEPc EPS solves + extension
MatMatMult (SURVEY.md §2.2 component #6, §1.2 Stage 4, §3.4; Fowlkes et al.
2004). Direct ``jnp.linalg.eigh`` on the replicated p x p blocks replaces the
distributed Krylov solver — p is capped at O(thousands) by design, so direct
is both faster on the MXU and communication-free. The (N, p) x (p, m)
extension GEMMs are embarrassingly row-parallel.

Algorithm (all inverses truncated pseudo-inverses, ops/linalg.py):

1. Whalf = W_AA^{-1/2};  S = W_AA + Whalf (W_AB W_AB^T) Whalf;
   eigh(S) -> top-m (L_S, U_m).
2. basis0 = Whalf U_m L_S^{-1/2}  (p, m);
   extension GEMMs V0 = [W_AA; W_AB^T] basis0  (N, m).
3. Column-norm correction: d_j = |V0_j|^2 (assembled from the two extension
   blocks, no extra N-sized pass); columns with d_j above a live-threshold
   are rescaled to exactly unit norm, the rest are zeroed.

Step 3 is the f32 safety net: with a truncated pseudo-inverse on
rank-deficient kernel blocks, f32 rounding can push spurious directions into
the top-m of S; their defining property is a tiny TRUE column norm (the
f64 oracle's live columns come out at ~1). Pure projection filters are
insensitive (the weight f(lambda)~lambda is tiny there), but affine filters
(sharpening) weight every unit of spurious column mass by ~beta, so the
norms must be policed. A diagonal-only correction is used deliberately: a
full Gram-matrix orthogonalization re-amplifies the garbage columns to unit
norm (measured 0.87 dB parity loss), while the diagonal form kills them.

Exact for p = N (modulo the harmless unit-norm rescale).

Precision caveat (documented, not fixable at f32): when the m-th eigenvalue
falls inside a DENSE spectral band (gaps ~1e-4 against an f32 noise floor
~1e-3 after pseudo-inverse amplification), the top-m SUBSPACE itself is
ill-posed — any two implementations pick different near-degenerate
directions. Filters weighting the tail by ~lambda (identity/power/exp_decay,
the graded denoise gate) are insensitive and hold 0.1 dB parity; filters
weighting the tail by ~1 (lowpass projection, affine sharpening) agree to
~25-35 dB PSNR between f32 and the f64 oracle instead. tests/ encode these
per-filter-class tolerances.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .linalg import (
    psd_pinv_sqrt,
    psd_pinv_sqrt_np,
    trunc_inv_sqrt_vals,
    trunc_inv_sqrt_vals_np,
)

# columns whose true squared norm falls below this are spurious (live
# one-shot columns sit at ~1, truncation-killed at 0)
_LIVE_NORM2 = 0.25


class EigenBasis(NamedTuple):
    """Top-m approximate eigenpairs of the scaled filter matrix W~.

    ``vecs`` rows are in permuted [A; B] pixel order; live columns unit-norm,
    truncation-killed/spurious columns exactly zero; descending eigenvalue
    order.
    """

    vals: jnp.ndarray    # (m,)
    vecs: jnp.ndarray    # (N, m)


def nystrom_eigh(waa: jnp.ndarray, wab: jnp.ndarray, m: int,
                 eig_tol: float) -> EigenBasis:
    whalf = psd_pinv_sqrt(waa, eig_tol)
    cross = wab @ wab.T                               # (p, p), one strip GEMM
    s_mat = waa + whalf @ cross @ whalf
    s_mat = 0.5 * (s_mat + s_mat.T)
    vals, vecs = jnp.linalg.eigh(s_mat)               # ascending
    vals_m = vals[::-1][:m]                           # descending top-m
    vecs_m = vecs[:, ::-1][:, :m]

    inv_sqrt_vals = trunc_inv_sqrt_vals(vals_m, eig_tol)
    basis0 = whalf @ (vecs_m * inv_sqrt_vals[None, :])    # (p, m)
    v_a = waa @ basis0                                    # (p, m)
    v_b = wab.T @ basis0                                  # (N-p, m) extension

    d = jnp.sum(v_a * v_a, axis=0) + jnp.sum(v_b * v_b, axis=0)   # (m,)
    live = d > _LIVE_NORM2
    scale = jnp.where(live, 1.0 / jnp.sqrt(jnp.where(live, d, 1.0)), 0.0)
    v = jnp.concatenate([v_a, v_b], axis=0) * scale[None, :]
    return EigenBasis(vals=vals_m, vecs=v)


# --- numpy float64 twin for the CPU oracle ----------------------------------

def nystrom_eigh_np(waa: np.ndarray, wab: np.ndarray, m: int,
                    eig_tol: float):
    whalf = psd_pinv_sqrt_np(waa, eig_tol)
    cross = wab @ wab.T
    s_mat = waa + whalf @ cross @ whalf
    s_mat = 0.5 * (s_mat + s_mat.T)
    vals, vecs = np.linalg.eigh(s_mat)
    vals_m = vals[::-1][:m].copy()
    vecs_m = vecs[:, ::-1][:, :m]

    inv_sqrt_vals = trunc_inv_sqrt_vals_np(vals_m, eig_tol)
    basis0 = whalf @ (vecs_m * inv_sqrt_vals[None, :])
    v_a = waa @ basis0
    v_b = wab.T @ basis0

    d = np.sum(v_a * v_a, axis=0) + np.sum(v_b * v_b, axis=0)
    live = d > _LIVE_NORM2
    scale = np.where(live, 1.0 / np.sqrt(np.where(live, d, 1.0)), 0.0)
    v = np.concatenate([v_a, v_b], axis=0) * scale[None, :]
    return vals_m, v
