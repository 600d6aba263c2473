"""Sinkhorn doubly-stochastic balancing in Nystrom low-rank form.

TPU-native equivalent of the reference's PETSc MatMult iteration loop
(SURVEY.md §2.2 component #5, §1.2 Stage 3, §3.3; GLIDE Alg. 1). The N x N
filter matrix is never materialized: each iteration does two strip matvecs
against the implicit completion

    K~ = [ K_AA                K_AB              ]
         [ K_BA   K_BA K_AA^+ K_AB               ]

using only the stored (p, N) strip plus one truncated p x p pseudo-inverse — O(Np) per
iteration.

TPU-first control flow (SURVEY.md §3.3 note): a fixed-iteration
``lax.fori_loop`` (shape-static, pipelineable) instead of the reference's
convergence-tested while loop; ``sinkhorn_iters`` is config. The symmetric
update ``s <- sqrt(s / (K~ s))`` (Knight 2008) is used instead of r/c
alternation: K~ is symmetric, the geometric-mean step damps the odd/even
oscillation of plain Sinkhorn-Knopp, and the single scaling vector keeps the
scaled matrix exactly symmetric for the eigensolve.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .linalg import psd_pinv, psd_pinv_np

_EPS = 1e-30


def _make_kaa_solve(kaa, eig_tol: float, solver: str):
    """u -> K_AA^+ u (truncated pinv) or (K_AA + eps I)^{-1} u (ridge chol).

    The chol form skips one O(p^3) eigh — the dominant TPU cost at p ~ 5k
    (see ops/nystrom.py chol notes). eps is relative to the max row sum.
    """
    if solver in ("chol", "lobpcg", "sketch"):
        import jax.scipy.linalg as jsl
        eps = eig_tol * jnp.max(jnp.sum(jnp.abs(kaa), axis=1))
        l = jnp.linalg.cholesky(kaa + eps * jnp.eye(kaa.shape[0], dtype=kaa.dtype))
        return lambda u: jsl.cho_solve((l, True), u)
    pinv = psd_pinv(kaa, eig_tol)
    return lambda u: pinv @ u


def _make_kaa_solve_np(kaa, eig_tol: float, solver: str):
    if solver in ("chol", "lobpcg", "sketch"):
        import scipy.linalg as sl
        eps = eig_tol * np.max(np.sum(np.abs(kaa), axis=1))
        cf = sl.cho_factor(kaa + eps * np.eye(kaa.shape[0]), lower=True)
        return lambda u: sl.cho_solve(cf, u)
    pinv = psd_pinv_np(kaa, eig_tol)
    return lambda u: pinv @ u


def nystrom_matvec(kaa, kab, kaa_solve, v_a, v_b):
    """(K~ v) for v = [v_a; v_b], via the strip only. O(Np).

    ``kaa_solve`` applies the (regularized) inverse of K_AA — a callable.
    """
    u = kab @ v_b                      # (p,)
    top = kaa @ v_a + u
    t = v_a + kaa_solve(u)
    bottom = kab.T @ t                 # (N-p,)
    return top, bottom


def sinkhorn_scaling(kaa, kab, iters: int, eig_tol: float,
                     solver: str = "oneshot"):
    """Scaling vector s with diag(s) K~ diag(s) ~ doubly stochastic.

    Returns (s_a (p,), s_b (N-p,)).
    """
    p = kaa.shape[0]
    nb = kab.shape[1]
    kaa_solve = _make_kaa_solve(kaa, eig_tol, solver)

    def body(_, s):
        s_a, s_b = s[:p], s[p:]
        top, bottom = nystrom_matvec(kaa, kab, kaa_solve, s_a, s_b)
        ks = jnp.concatenate([top, bottom])
        ks = jnp.maximum(ks, _EPS)     # K_BB completion can dip negative
        return jnp.sqrt(s / ks)

    s0 = jnp.ones(p + nb, dtype=kaa.dtype)
    s = jax.lax.fori_loop(0, iters, body, s0)
    return s[:p], s[p:]


def normalize_blocks(kaa, kab, normalization: str, iters: int, eig_tol: float,
                     solver: str = "oneshot"):
    """Scaled blocks (W_AA, W_AB) per the configured normalization.

    sinkhorn:  s from Sinkhorn balancing           (doubly stochastic)
    symmetric: s = 1/sqrt(K~ 1)                    (D^{-1/2} K D^{-1/2})
    none:      s = 1                               (raw kernel)
    """
    p = kaa.shape[0]
    if normalization == "sinkhorn":
        s_a, s_b = sinkhorn_scaling(kaa, kab, iters, eig_tol, solver)
    elif normalization == "symmetric":
        kaa_solve = _make_kaa_solve(kaa, eig_tol, solver)
        ones_a = jnp.ones(p, dtype=kaa.dtype)
        ones_b = jnp.ones(kab.shape[1], dtype=kaa.dtype)
        top, bottom = nystrom_matvec(kaa, kab, kaa_solve, ones_a, ones_b)
        s_a = jax.lax.rsqrt(jnp.maximum(top, _EPS))
        s_b = jax.lax.rsqrt(jnp.maximum(bottom, _EPS))
    else:
        s_a = jnp.ones(p, dtype=kaa.dtype)
        s_b = jnp.ones(kab.shape[1], dtype=kaa.dtype)

    waa = kaa * (s_a[:, None] * s_a[None, :])
    # preserve the strip's STORAGE dtype (bfloat16_store policy): the f32
    # scaling outer product would otherwise silently re-materialize the
    # (p, N) strip at f32, forfeiting the bandwidth the narrow store buys
    wab = (kab * (s_a[:, None] * s_b[None, :])).astype(kab.dtype)
    return waa, wab, s_a, s_b


# --- numpy float64 twins for the CPU oracle ---------------------------------

def nystrom_matvec_np(kaa, kab, kaa_solve, v_a, v_b):
    if not callable(kaa_solve):
        pinv = kaa_solve
        kaa_solve = lambda u: pinv @ u
    u = kab @ v_b
    top = kaa @ v_a + u
    t = v_a + kaa_solve(u)
    bottom = kab.T @ t
    return top, bottom


def sinkhorn_scaling_np(kaa, kab, iters: int, eig_tol: float,
                        solver: str = "oneshot"):
    p = kaa.shape[0]
    kaa_solve = _make_kaa_solve_np(kaa, eig_tol, solver)
    s = np.ones(p + kab.shape[1], dtype=np.float64)
    for _ in range(iters):
        top, bottom = nystrom_matvec_np(kaa, kab, kaa_solve, s[:p], s[p:])
        ks = np.maximum(np.concatenate([top, bottom]), _EPS)
        s = np.sqrt(s / ks)
    return s[:p], s[p:]


def normalize_blocks_np(kaa, kab, normalization: str, iters: int,
                        eig_tol: float, solver: str = "oneshot"):
    p = kaa.shape[0]
    if normalization == "sinkhorn":
        s_a, s_b = sinkhorn_scaling_np(kaa, kab, iters, eig_tol, solver)
    elif normalization == "symmetric":
        kaa_solve = _make_kaa_solve_np(kaa, eig_tol, solver)
        top, bottom = nystrom_matvec_np(kaa, kab, kaa_solve,
                                        np.ones(p), np.ones(kab.shape[1]))
        s_a = 1.0 / np.sqrt(np.maximum(top, _EPS))
        s_b = 1.0 / np.sqrt(np.maximum(bottom, _EPS))
    else:
        s_a = np.ones(p)
        s_b = np.ones(kab.shape[1])
    waa = kaa * (s_a[:, None] * s_a[None, :])
    wab = kab * (s_a[:, None] * s_b[None, :])
    return waa, wab, s_a, s_b
