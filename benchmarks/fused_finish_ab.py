"""cfg4 (8 MP) A/B: the two-sweep fused finish vs the unfused schedule.

The headline coarse+polish factor runs FOUR full-resolution exp-bound
kernel sweeps (extension rmatvec2, polish matvec, polish rmatvec,
colstats+V); cfg.fused_finish collapses them into TWO Pallas passes
(ops/pallas_streaming.ext2_matvec_pallas / finish_colstats_pallas) at the
cost of estimating the p x p spectrum from the PRE-polish scales
(models/streaming._factor_streaming_fused docstring). This script records
device wall + parity vs the f32 exact-Sinkhorn reference for both
schedules across image instances.

    python benchmarks/fused_finish_ab.py [n_seeds]      # real TPU
Appends ffin_* rows to benchmarks/results/cfg4_sweep.jsonl.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

# jax is pre-imported at interpreter startup on this box (a .pth hook),
# so JAX_* env mutations here are no-ops — config API only (CLAUDE.md)
import jax

from graphlap_tpu.utils.cache import setup_compilation_cache
setup_compilation_cache(Path(__file__).parent.parent)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np

from sweep_cfg4 import device_wall_and_out

RESULTS = Path(__file__).parent / "results" / "cfg4_sweep.jsonl"


def main():
    import graphlap_tpu as gl
    from graphlap_tpu.models.pipeline import make_plan

    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    h, w = 2048, 4096
    mp = h * w / 1e6
    base = gl.PipelineConfig(
        kernel="nlm", h=0.25, sample_rho=0.01, sample_cap=4096,
        num_eigvecs=50, sinkhorn_iters=6, filter_name="identity",
        streaming=True, block_cols=65536)
    headline = base.replace(affinity_dtype="bfloat16", sinkhorn_coarse=64,
                            gram_coarse=64, use_pallas=True,
                            sinkhorn_polish=1)
    fused = headline.replace(fused_finish=True)

    RESULTS.parent.mkdir(parents=True, exist_ok=True)
    for seed in range(1, 1 + n_seeds):
        img = gl.make_test_image(h, w, seed=seed - 1)
        noisy = np.clip(gl.add_gaussian_noise(img, 0.1, seed=seed), 0, 1)
        plan = make_plan(noisy, base)
        ref_cfg = base.replace(sinkhorn_iters=10)   # the sweep's reference
        _, ref_out = device_wall_and_out(noisy, ref_cfg, plan, reps=1)
        # ffin2_*: the parity-exact schedule (post-polish decimated
        # spectrum); the original pre-polish rows are the ffin_* history
        for name, cfg in (("ffin2_off", headline), ("ffin2_on", fused)):
            wall, out = device_wall_and_out(noisy, cfg, plan)
            rec = {
                "recipe": f"{name}_seed{seed}",
                "device_wall_s": round(wall, 4),
                "device_mp_per_s": round(mp / wall, 3),
                "psnr_out_db": round(gl.psnr(img, out), 4),
                "psnr_vs_f32_db": round(gl.psnr(ref_out, out), 2),
                "dpsnr_vs_clean_db": round(
                    abs(gl.psnr(img, out) - gl.psnr(img, ref_out)), 4),
                "config_hash": cfg.config_hash(), "ts": time.time(),
            }
            with RESULTS.open("a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
