"""Pixel-affinity construction: features + the K_AA / K_AB strip.

TPU-native equivalent of the reference's per-row kernel-evaluation loop
filling PETSc MATMPIDENSE blocks (SURVEY.md §2.2 component #4, §3.2).
Design is TPU-first (SURVEY.md §7 hard part 3): per-pixel dynamic gathers are
poison on TPU, so the image is pre-unfolded once into an (N, d) feature
tensor and every kernel evaluation becomes one big GEMM via
``|a-b|^2 = |a|^2 + |b|^2 - 2 a.b`` — all FLOPs land on the MXU.

Bandwidths are folded into the features (feats = raw / h), so the kernel is
uniformly ``K = exp(-|f_i - f_j|^2)``; one code path serves Gaussian,
bilateral, and NLM.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..config import PipelineConfig


def feature_dim(cfg: PipelineConfig) -> int:
    if cfg.kernel == "nlm":
        d = cfg.patch_size * cfg.patch_size
    else:
        d = 1
    if cfg.spatial_h > 0.0:
        d += 2
    return d


def _unfold_patches(img: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(H, W) -> (H*W, patch*patch) of reflect-padded neighborhoods.

    One pad + static shifted slices: compiles to cheap strided copies, no
    per-pixel dynamic_slice (SURVEY.md §7 hard part 3).
    """
    r = patch // 2
    h, w = img.shape
    padded = jnp.pad(img, r, mode="reflect")
    views = [
        padded[dy:dy + h, dx:dx + w]
        for dy in range(patch)
        for dx in range(patch)
    ]
    return jnp.stack(views, axis=-1).reshape(h * w, patch * patch)


def extract_features(img: jnp.ndarray, cfg: PipelineConfig,
                     h=None) -> jnp.ndarray:
    """(H, W) image -> (N, d) float32 feature rows with bandwidths folded in.

    gaussian: f_i = y_i / h                      (photometric; SURVEY.md §1.2)
    nlm:      f_i = P_i / (h * patch)            (5x5 patch, per-pixel RMS h)
    spatial_h > 0 appends (row, col) / spatial_h (bilateral form).

    ``h`` overrides cfg.h and may be a TRACED scalar: since the bandwidth
    only enters as this feature scaling, a bandwidth sweep (tune.py SURE
    grid) can run every candidate through ONE compiled executable instead
    of recompiling per h (cfg fields are static jit args).

    cfg.feature_dtype="bfloat16" rounds the RETURNED tensor to bf16 — the
    streaming path's capacity lever (the (N, d) features are its only
    O(N)-by-d resident buffer; tiles are recomputed). Every consumer
    upcasts or casts to its own compute dtype, so under a bf16 tile mode
    the GEMM inputs are bit-identical and only the f32 norms see the
    rounding. spatial_h > 0 is rejected at config time (coordinate
    cancellation).
    """
    h_img, w_img = img.shape
    img = img.astype(jnp.float32)
    h = cfg.h if h is None else h

    if cfg.kernel == "nlm":
        d = cfg.patch_size * cfg.patch_size
        feats = _unfold_patches(img, cfg.patch_size) / (h * math.sqrt(d))
    else:
        feats = (img / h).reshape(-1, 1)

    if cfg.spatial_h > 0.0:
        yy, xx = jnp.meshgrid(
            jnp.arange(h_img, dtype=jnp.float32),
            jnp.arange(w_img, dtype=jnp.float32),
            indexing="ij",
        )
        coords = jnp.stack([yy.ravel(), xx.ravel()], axis=-1) / cfg.spatial_h
        feats = jnp.concatenate([feats, coords], axis=-1)
    if cfg.feature_dtype == "bfloat16":
        feats = feats.astype(jnp.bfloat16)
    return feats


def affinity_strip(
    feats_a: jnp.ndarray,
    feats_all: jnp.ndarray,
    dtype: jnp.dtype = jnp.float32,
    store_dtype: jnp.dtype | None = None,
) -> jnp.ndarray:
    """K strip (p, N): K[i, j] = exp(-|f_Ai - f_j|^2) via the GEMM trick.

    ``feats_all`` is in permuted [A; B] order, so columns [:p] are K_AA and
    [p:] are K_AB (SURVEY.md §1.2 Stage 2). The GEMM runs in ``dtype``
    (bf16 allowed, accumulating f32 on the MXU); distances are clamped at 0
    to kill negative round-off. Output is float32 unless ``store_dtype``
    narrows the STORED strip (distances/exp stay in the compute dtype —
    the bfloat16_store policy: exact math, half the downstream bandwidth).
    """
    a = feats_a.astype(dtype)
    b = feats_all.astype(dtype)
    prec = "default" if dtype == jnp.bfloat16 else "highest"
    cross = jnp.dot(a, b.T, preferred_element_type=jnp.float32, precision=prec)
    na = jnp.sum(feats_a.astype(jnp.float32) ** 2, axis=1)
    nb = jnp.sum(feats_all.astype(jnp.float32) ** 2, axis=1)
    d2 = jnp.maximum(na[:, None] + nb[None, :] - 2.0 * cross, 0.0)
    out = jnp.exp(-d2)
    return out if store_dtype is None else out.astype(store_dtype)


def affinity_blocks(img: jnp.ndarray, idx_a: jnp.ndarray, perm: jnp.ndarray,
                    cfg: PipelineConfig, h=None):
    """Full materialized path: (K_AA (p,p), K_AB (p,N-p)) for one channel.

    K_AA and K_AB are built as separate GEMMs rather than slicing one
    (p, N) strip: slices copy, and at config-2 scale (5.4 GB strip) a
    strip + two slice copies exhausts HBM (measured RESOURCE_EXHAUSTED on
    v5 lite). This way exactly one big buffer lives.

    ``h``: optional traced bandwidth override (see extract_features).
    """
    feats = extract_features(img, cfg, h=h)
    feats_perm = jnp.take(feats, perm, axis=0)
    p = idx_a.shape[0]
    feats_a = feats_perm[:p]
    dtype = jnp.bfloat16 if cfg.affinity_dtype == "bfloat16" else jnp.float32
    store = (jnp.bfloat16 if cfg.affinity_dtype == "bfloat16_store" else None)
    # K_AA stays f32 regardless: it feeds the p x p Cholesky/ridge solves
    # and is tiny; only the (p, N-p) strip pays the bandwidth bill
    kaa = affinity_strip(feats_a, feats_a, dtype)
    if cfg.use_pallas:
        from .pallas_affinity import affinity_strip_pallas
        kab = affinity_strip_pallas(feats_a, feats_perm[p:], dtype=dtype,
                                    store_dtype=store)
    else:
        kab = affinity_strip(feats_a, feats_perm[p:], dtype=dtype,
                             store_dtype=store)
    return kaa, kab


# ---------------------------------------------------------------------------
# numpy twin used by the float64 oracle (tests/oracle.py): kept adjacent so
# the two implementations stay in lock-step.
# ---------------------------------------------------------------------------

def extract_features_np(img: np.ndarray, cfg: PipelineConfig,
                        h=None) -> np.ndarray:
    h_img, w_img = img.shape
    img = np.asarray(img, dtype=np.float64)
    h = cfg.h if h is None else h
    if cfg.kernel == "nlm":
        r = cfg.patch_size // 2
        d = cfg.patch_size * cfg.patch_size
        padded = np.pad(img, r, mode="reflect")
        views = [
            padded[dy:dy + h_img, dx:dx + w_img]
            for dy in range(cfg.patch_size)
            for dx in range(cfg.patch_size)
        ]
        feats = np.stack(views, axis=-1).reshape(h_img * w_img, d)
        feats = feats / (h * math.sqrt(d))
    else:
        feats = (img / h).reshape(-1, 1)
    if cfg.spatial_h > 0.0:
        yy, xx = np.meshgrid(np.arange(h_img, dtype=np.float64),
                             np.arange(w_img, dtype=np.float64), indexing="ij")
        coords = np.stack([yy.ravel(), xx.ravel()], axis=-1) / cfg.spatial_h
        feats = np.concatenate([feats, coords], axis=-1)
    return feats


def affinity_strip_np(feats_a: np.ndarray, feats_all: np.ndarray) -> np.ndarray:
    na = np.sum(feats_a**2, axis=1)
    nb = np.sum(feats_all**2, axis=1)
    d2 = np.maximum(na[:, None] + nb[None, :] - 2.0 * feats_a @ feats_all.T, 0.0)
    return np.exp(-d2)
