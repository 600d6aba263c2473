"""cfg4 (8 MP) recipe sweep: device wall + parity of each accelerator stack.

Runs the gate-compliant f32 exact-Sinkhorn streaming pipeline once as the
parity reference, then each candidate recipe (bf16, coarse Sinkhorn k,
coarse gram k_g), recording device wall, PSNR vs clean, and PSNR delta /
agreement vs the f32 reference. Picks the recipe for the headline row with
a measured parity bound attached (VERDICT r1 items 5+6).

    python benchmarks/sweep_cfg4.py            # real TPU
Appends to benchmarks/results/cfg4_sweep.jsonl.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

# jax is pre-imported at interpreter startup on this box (a .pth
# hook), so JAX_* env mutations here are no-ops — only the config
# API takes effect (same trap as JAX_PLATFORMS; CLAUDE.md)
import jax

from graphlap_tpu.utils.cache import setup_compilation_cache
setup_compilation_cache(Path(__file__).parent.parent)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np

RESULTS = Path(__file__).parent / "results" / "cfg4_sweep.jsonl"


def device_wall_and_out(image, cfg, plan, reps=3):
    import jax
    import jax.numpy as jnp
    from graphlap_tpu.models.pipeline import _filter_channel

    img = jax.device_put(jnp.asarray(image, jnp.float32))
    idx_a = jax.device_put(jnp.asarray(plan.idx_a))
    perm = jax.device_put(jnp.asarray(plan.perm))
    inv_perm = jax.device_put(jnp.asarray(plan.inv_perm))
    sync = jax.jit(jnp.sum)
    z, _ = _filter_channel(img, idx_a, perm, inv_perm, cfg)
    float(sync(z))
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        z, _ = _filter_channel(img, idx_a, perm, inv_perm, cfg)
        float(sync(z))
        walls.append(time.perf_counter() - t0)
    return min(walls), np.asarray(z)


def main():
    import graphlap_tpu as gl
    from graphlap_tpu.models.pipeline import make_plan

    h, w = 2048, 4096
    img = gl.make_test_image(h, w)
    noisy = np.clip(gl.add_gaussian_noise(img, 0.1, seed=1), 0, 1)
    base = gl.PipelineConfig(
        kernel="nlm", h=0.25, sample_rho=0.01, sample_cap=4096,
        num_eigvecs=50, sinkhorn_iters=10, filter_name="identity",
        streaming=True, block_cols=131072)
    plan = make_plan(noisy, base)
    mp = h * w / 1e6

    bf16 = base.replace(affinity_dtype="bfloat16")
    turbo = bf16.replace(sinkhorn_coarse=64, gram_coarse=8, use_pallas=True)
    p1 = turbo.replace(sinkhorn_polish=1)
    tuned = p1.replace(sinkhorn_iters=6, block_cols=65536)
    recipes = [
        ("f32_exact", base),
        # round 2g: deeper gram decimation under the tuned polish recipe —
        # gc8 cost only 0.0012 dB with exact Sinkhorn, so the p x p spectrum
        # tolerates much sparser column subsampling; gram is ~0.27 s of the
        # 0.67 s headline at gc8
        ("p1_gc16", tuned.replace(gram_coarse=16)),
        ("p1_gc32", tuned.replace(gram_coarse=32)),
        ("p1_gc16_sc128", tuned.replace(gram_coarse=16, sinkhorn_coarse=128)),
    ]

    ref_out = None
    RESULTS.parent.mkdir(parents=True, exist_ok=True)
    for name, cfg in recipes:
        wall, out = device_wall_and_out(noisy, cfg, plan)
        rec = {
            "recipe": name, "device_wall_s": round(wall, 4),
            "device_mp_per_s": round(mp / wall, 3),
            "psnr_out_db": round(gl.psnr(img, out), 4),
            "config_hash": cfg.config_hash(), "ts": time.time(),
        }
        if name == "f32_exact":
            ref_out = out
            rec["is_reference"] = True
        else:
            rec["psnr_vs_f32_db"] = round(gl.psnr(ref_out, out), 2)
            rec["dpsnr_vs_clean_db"] = round(
                abs(gl.psnr(img, out) - gl.psnr(img, ref_out)), 4)
        with RESULTS.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
