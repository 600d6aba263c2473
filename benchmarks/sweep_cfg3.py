"""cfg3 (1024^2, sharpen filter, streaming) coarse-Sinkhorn recipe sweep.

The sharpen filter is AFFINE (z = y + V (f(L)-1) V^T y, f(l) = 1+b(1-l)):
unlike the denoise families it weights the (1 - lambda) tail, so residual
Sinkhorn-scaling error in the eigenvalues is amplified instead of damped —
one full-res polish (the denoise-calibrated recipe) measured ~0.5 dB off
the exact trajectory where the identity-filter 8 MP recipe holds 0.03-0.05.
This sweep measures polish depth x coarse iters at cfg3's (N=1M, p=4096)
across noise seeds to calibrate the preset's filter-aware polish count.
Appends to benchmarks/results/cfg3_sweep.jsonl.
"""

from __future__ import annotations

import json
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

RESULTS = Path(__file__).parent / "results" / "cfg3_sweep.jsonl"


def device_wall_and_out(image, cfg, plan, reps=3):
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

    img = gl.make_test_image(1024, 1024)
    # pinned SPECTRAL: this sweep measures the rank-m affine instability
    # the recorded rows document — CONFIG3 now defaults to matvec (the
    # fix), so a rerun without the pin would measure the wrong thing
    base = gl.CONFIG3.replace(streaming=True, block_cols=131072,
                              affinity_dtype="bfloat16", use_pallas=True,
                              filter_mode="spectral")
    # gate-compliant exact twin (benchmarks/run.py _parity_cfg convention)
    exact = base.replace(affinity_dtype="float32", use_pallas=False,
                         sinkhorn_coarse=1, sinkhorn_polish=0, gram_coarse=1,
                         sinkhorn_iters=20)

    recipes = {
        # current matrix row3 recipe: full-res Sinkhorn, gc4
        "cur_fullres20_gc4": base.replace(gram_coarse=4),
        # the preset's denoise-calibrated choice (sc8, 6 iters, 1 polish)
        "sc8_it6_p1_gc8": base.replace(sinkhorn_coarse=8, sinkhorn_iters=6,
                                       sinkhorn_polish=1, gram_coarse=8),
        # candidate: second full-res polish for the affine filter
        "sc8_it6_p2_gc8": base.replace(sinkhorn_coarse=8, sinkhorn_iters=6,
                                       sinkhorn_polish=2, gram_coarse=8),
        # coarse depth check: do extra (near-free) coarse iters substitute?
        "sc8_it12_p2_gc8": base.replace(sinkhorn_coarse=8, sinkhorn_iters=12,
                                        sinkhorn_polish=2, gram_coarse=8),
        # turbo-for-affine candidate (polish floor of 1 instead of 0)
        "sc8_it6_p1_gc16": base.replace(sinkhorn_coarse=8, sinkhorn_iters=6,
                                        sinkhorn_polish=1, gram_coarse=16),
        "sc8_it6_p2_gc16": base.replace(sinkhorn_coarse=8, sinkhorn_iters=6,
                                        sinkhorn_polish=2, gram_coarse=16),
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
