"""Global-shift registration for the temporal guide (host-side numpy).

The measured temporal-guide boundary (benchmarks/motion_guide.py) is a
per-group displacement of ~0.5-1 px — camera pan kills basis reuse long
before scene change does. Phase correlation recovers a global
translation to sub-pixel accuracy in O(N log N) (Kuglin & Hines 1975 +
parabolic peak refinement), so the guided path can align each group to
its first frame, build the mean guide from REGISTERED frames, filter in
the registered coordinates, and shift each output back. Pure-translation
motion then behaves like a static scene (tests/test_video.py pins the
v=1 px/frame case flipping from -3 dB to a win).

Host-side by design: shifts are data-dependent scalars; estimating them
in numpy keeps the jitted pipeline static-shaped (the same reason the
sampling plan is host-side — utils/sampling.py docstring).
"""

from __future__ import annotations

import numpy as np


def _parabolic(vm1: float, v0: float, vp1: float) -> float:
    """Sub-sample offset of a peak from its two neighbors (|off| <= 0.5)."""
    denom = vm1 - 2.0 * v0 + vp1
    if abs(denom) < 1e-12:
        return 0.0
    return float(np.clip(0.5 * (vm1 - vp1) / denom, -0.5, 0.5))


def estimate_shift(ref: np.ndarray, moved: np.ndarray) -> tuple[float, float]:
    """(dy, dx) such that ``moved`` ~= ``ref`` translated by (dy, dx);
    aligning: shift ``moved`` by (-dy, -dx). Sub-pixel via parabolic
    refinement of the phase-correlation peak."""
    a = np.asarray(ref, np.float64)
    b = np.asarray(moved, np.float64)
    if a.shape != b.shape or a.ndim != 2:
        raise ValueError(f"need matching 2D frames, got {a.shape}/{b.shape}")
    fa = np.fft.rfft2(a - a.mean())
    fb = np.fft.rfft2(b - b.mean())
    cross = fb * np.conj(fa)
    cross /= np.maximum(np.abs(cross), 1e-12)
    corr = np.fft.irfft2(cross, s=a.shape)
    py, px = np.unravel_index(int(np.argmax(corr)), corr.shape)
    h, w = a.shape
    v0 = float(corr[py, px])
    dy = py + _parabolic(float(corr[(py - 1) % h, px]), v0,
                         float(corr[(py + 1) % h, px]))
    dx = px + _parabolic(float(corr[py, (px - 1) % w]), v0,
                         float(corr[py, (px + 1) % w]))
    if dy > h / 2:
        dy -= h                                   # wrap to signed
    if dx > w / 2:
        dx -= w
    return float(dy), float(dx)


def shift_image(img: np.ndarray, dy: float, dx: float) -> np.ndarray:
    """Translate (H, W[, C]) by (dy, dx) px, spline interp, reflect
    edges. No-op fast path for |d| < 1e-3."""
    if abs(dy) < 1e-3 and abs(dx) < 1e-3:
        return np.asarray(img, np.float32)
    from scipy.ndimage import shift as nd_shift

    img = np.asarray(img, np.float32)
    vec = (dy, dx) if img.ndim == 2 else (dy, dx, 0.0)
    return nd_shift(img, vec, order=3, mode="reflect").astype(np.float32)
