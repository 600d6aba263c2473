"""Off-device evidence for the jittered gram sampler (pure numpy, CPU).

Measures the top-m eigenvalue error of the decimated gram estimate under
three column-sampling schemes — plain stride, jittered (one uniform column
per k-slot), and variants (golden-ratio / antithetic offsets) — against
the exact gram at an oracle-feasible size. This is the experiment that
motivated models/streaming.gram_sample_idx: the stride aliases with the
raster (x ≡ 0 mod k vertical stripes) and collapses at k=16, while jitter
stays flat (then confirmed on-device at 8 MP: cfg4_sweep.jsonl jit_*
rows).

    python benchmarks/alias_experiment.py        # ~2 min on one CPU core
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from graphlap_tpu.config import PipelineConfig            # noqa: E402
from graphlap_tpu.io import add_gaussian_noise, make_test_image  # noqa: E402
from graphlap_tpu.ops.affinity import extract_features_np  # noqa: E402
from graphlap_tpu.utils.sampling import uniform_grid_sample  # noqa: E402

PHI = (np.sqrt(5) - 1) / 2


def main(h=512, w=512, p=512, m=50, seeds=(1, 2, 3)):
    cfg = PipelineConfig(kernel="nlm", h=0.25)
    n = h * w
    for seed in seeds:
        img = np.clip(add_gaussian_noise(make_test_image(h, w, seed=seed),
                                         0.1, seed=seed), 0, 1)
        feats = extract_features_np(img, cfg).astype(np.float32)
        fa = feats[uniform_grid_sample(h, w, p).idx_a]

        def kcols(js):
            fb = feats[js]
            d2 = (np.sum(fa * fa, 1)[:, None] + np.sum(fb * fb, 1)[None, :]
                  - 2.0 * (fa @ fb.T))
            return np.exp(-np.maximum(d2, 0.0))

        exact = np.zeros((p, p), np.float32)
        for lo in range(0, n, 65536):
            kb = kcols(np.arange(lo, min(lo + 65536, n)))
            exact += kb @ kb.T
        ew = np.linalg.eigvalsh(exact.astype(np.float64))[::-1][:m]

        for k in (8, 16, 32):
            nslot = n // k
            slots = np.arange(nslot) * k
            rng = np.random.default_rng(0)
            schemes = {
                "strided": slots,
                "jittered": slots + rng.integers(0, k, nslot),
                "golden": slots + np.floor(
                    (np.arange(nslot) * PHI % 1.0) * k).astype(int),
            }
            line = []
            for name, js in schemes.items():
                kb = kcols(np.minimum(js, n - 1))
                ee = np.linalg.eigvalsh(
                    (kb @ kb.T * k).astype(np.float64))[::-1][:m]
                r = np.abs(ee - ew) / np.abs(ew)
                line.append(f"{name} mean={r.mean():.4f} max={r.max():.4f}")
            print(f"seed={seed} k={k}: " + " | ".join(line), flush=True)


if __name__ == "__main__":
    main()
