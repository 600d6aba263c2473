"""cfg3 matvec-mode recipe sweep: the production sharpen recipe.

With filter_mode="matvec" (CONFIG3 default) the pipeline is Sinkhorn +
ONE completion matvec — no gram, no eigensolve. The knobs left are the
Sinkhorn recipe (full-res vs coarse+polish) and the tile backend
(Pallas vs XLA scan; the diag_* rows measured Pallas SLOWER on the pure
matvec workload at full-res Sinkhorn — this sweep decides the preset).
Parity twin: f32 XLA full-res matvec (benchmarks/run._parity_cfg form).
Appends to benchmarks/results/cfg3_sweep.jsonl.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax

from graphlap_tpu.utils.cache import setup_compilation_cache
setup_compilation_cache(Path(__file__).parent.parent)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np

RESULTS = Path(__file__).parent / "results" / "cfg3_sweep.jsonl"

from sweep_cfg3 import device_wall_and_out


def main():
    import graphlap_tpu as gl
    from graphlap_tpu.models.pipeline import make_plan

    img = gl.make_test_image(1024, 1024)
    base = gl.CONFIG3.replace(streaming=True, block_cols=131072,
                              affinity_dtype="bfloat16")
    # NB the first sweep of this script ran with the twin inheriting bf16
    # from ``base`` (psnr_vs_f32 actually vs bf16-full20 there); chained
    # with the diag_* rows (bf16 vs f32 ~ 80 dB) the conclusions stand.
    exact = base.replace(affinity_dtype="float32", sinkhorn_iters=20)

    recipes = {
        "mv_bf16_xla_full20": base.replace(sinkhorn_iters=20),
        "mv_bf16_xla_full10": base.replace(sinkhorn_iters=10),
        "mv_bf16_xla_sc8_p1": base.replace(sinkhorn_coarse=8,
                                           sinkhorn_iters=6,
                                           sinkhorn_polish=1),
        "mv_bf16_pallas_sc8_p1": base.replace(sinkhorn_coarse=8,
                                              sinkhorn_iters=6,
                                              sinkhorn_polish=1,
                                              use_pallas=True),
        "mv_bf16_xla_sc8_p0": base.replace(sinkhorn_coarse=8,
                                           sinkhorn_iters=6),
    }

    mp = 1024 * 1024 / 1e6
    for seed in (3, 11, 29):
        noisy = np.clip(gl.add_gaussian_noise(img, 0.03, seed=seed), 0, 1)
        plan = make_plan(noisy, base)
        _, ref = device_wall_and_out(noisy, exact, plan, reps=1)
        psnr_ref = gl.psnr(img, ref)
        for name, cfg in recipes.items():
            wall, out = device_wall_and_out(noisy, cfg, plan)
            rec = {
                "recipe": name, "seed": seed,
                "device_wall_s": round(wall, 4),
                "device_mp_per_s": round(mp / wall, 3),
                "psnr_vs_f32_db": round(gl.psnr(ref, out), 2),
                "dpsnr_vs_clean_db": round(
                    abs(gl.psnr(img, out) - psnr_ref), 4),
                "psnr_out_db": round(gl.psnr(img, out), 3),
                "p": plan.p, "config_hash": cfg.config_hash(),
                "ts": time.time(),
            }
            RESULTS.parent.mkdir(parents=True, exist_ok=True)
            with RESULTS.open("a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
