"""Eigenbasis checkpointing: persist (V, Lambda) so multiple spectral
filters replay without re-solving.

The reference has no checkpointing (SURVEY.md §5); this is the one useful
addition the blueprint calls for: the basis is filter-independent, so a
saved basis lets a user sweep f(lambda) families (denoise strengths,
sharpening gains) at O(N m) per filter instead of re-running the
O(N p^2) eigensolve.
"""

from __future__ import annotations

from pathlib import Path
from typing import NamedTuple

import numpy as np


class SavedBasis(NamedTuple):
    vals: np.ndarray       # (C?, m)
    vecs: np.ndarray       # (C?, N, m) in permuted [A; B] order
    perm: np.ndarray       # (N,)
    inv_perm: np.ndarray   # (N,)
    height: int
    width: int
    config_hash: str


def save_basis(path: str | Path, vals, vecs, plan, cfg) -> None:
    np.savez_compressed(
        path, vals=np.asarray(vals), vecs=np.asarray(vecs),
        perm=plan.perm, inv_perm=plan.inv_perm,
        shape=np.array([plan.height, plan.width]),
        config_hash=np.array(cfg.config_hash()),
    )


def load_basis(path: str | Path) -> SavedBasis:
    z = np.load(path, allow_pickle=False)
    h, w = (int(x) for x in z["shape"])
    return SavedBasis(vals=z["vals"], vecs=z["vecs"], perm=z["perm"],
                      inv_perm=z["inv_perm"], height=h, width=w,
                      config_hash=str(z["config_hash"]))


def filter_with_basis(image: np.ndarray, basis: SavedBasis,
                      filter_name: str, filter_param: float) -> np.ndarray:
    """Replay a spectral filter through a saved basis. Host-side O(N m)."""
    from ..ops.filters import apply_spectral_filter_np

    image = np.asarray(image, np.float64)
    if image.shape[:2] != (basis.height, basis.width):
        raise ValueError(f"image {image.shape[:2]} != basis "
                         f"{(basis.height, basis.width)}")

    def one(img2d, vals, vecs):
        y = img2d.ravel()[basis.perm]
        z = apply_spectral_filter_np(y, vals, vecs, filter_name, filter_param)
        return np.clip(z[basis.inv_perm].reshape(img2d.shape), 0.0, 1.0)

    if image.ndim == 2:
        return one(image, basis.vals, basis.vecs)
    if basis.vals.ndim == 1:
        # shared basis (rgb_mode='luma_basis'): one spectrum, every channel
        # replayed through it
        chans = [one(image[..., c], basis.vals, basis.vecs)
                 for c in range(image.shape[-1])]
    else:
        chans = [one(image[..., c], basis.vals[c], basis.vecs[c])
                 for c in range(image.shape[-1])]
    return np.stack(chans, axis=-1)
