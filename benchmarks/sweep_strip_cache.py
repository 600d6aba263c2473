"""cfg2 strip_cache recipe sweep: scale-fold sketch, iteration count, seeds.

Round-4 continuation of benchmarks/ab_strip_cache.py (VERDICT r3 #3):
measures the folded-sandwich sketch (scales applied inside the thin
passes — no scaled-strip materialization), sinkhorn_iters 6 vs 8, across
4 noise seeds. Parity per seed is vs the gate-compliant all-f32 exact
streaming run of the same shape (the established BASELINE.md methodology);
seed 1 additionally gets the direct f64-oracle delta via the snapshot.

Reports BOTH wall conventions:
  device_wall_s      — scalar-readback sync (comparable to every historic
                       number in this repo; includes this box's ~30 ms
                       tunnel RTT)
  device_amort_ms    — K dispatches / one sync, RTT measured & subtracted
                       (the number a locally-attached deployment pays)

Appends to benchmarks/results/cfg2_sweep.jsonl.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

from graphlap_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache(Path(__file__).parent.parent)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import jax.numpy as jnp
import numpy as np

RESULTS = Path(__file__).parent / "results" / "cfg2_sweep.jsonl"
ORACLE_NPY = Path(__file__).parent / "results" / "oracle_cfg2_512.npy"


def measure_rtt(sync, reps=20):
    z = jnp.zeros(())
    float(sync(z))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(sync(z))
    return (time.perf_counter() - t0) / reps


def walls(image2d, cfg, plan, rtt, sync, reps=5, k_amort=6):
    from graphlap_tpu.models.pipeline import _filter_channel

    img = jax.device_put(jnp.asarray(image2d, jnp.float32))
    idx_a = jax.device_put(jnp.asarray(plan.idx_a))
    perm = inv_perm = idx_a              # streaming contract: never read
    z, _ = _filter_channel(img, idx_a, perm, inv_perm, cfg)
    float(sync(z))                       # compile + warm
    ws = []
    for _ in range(reps):
        t0 = time.perf_counter()
        z, _ = _filter_channel(img, idx_a, perm, inv_perm, cfg)
        float(sync(z))
        ws.append(time.perf_counter() - t0)
    amort = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(k_amort):
            z, _ = _filter_channel(img, idx_a, perm, inv_perm, cfg)
        float(sync(z))
        amort.append((time.perf_counter() - t0 - rtt) / k_amort)
    return min(ws), min(amort), np.asarray(z)


def main():
    import graphlap_tpu as gl
    from graphlap_tpu.models.pipeline import make_plan

    sync = jax.jit(jnp.sum)
    rtt = measure_rtt(sync)
    print(f"# sync RTT {rtt*1e3:.1f} ms", flush=True)

    img = gl.make_test_image(512, 512)
    orc = np.load(ORACLE_NPY) if ORACLE_NPY.exists() else None

    base = gl.CONFIG2.replace(
        streaming=True, strip_cache=True, block_cols=512 * 512,
        use_pallas=False, affinity_dtype="bfloat16_store",
        solver="sketch", sketch_oversample=206, sketch_power=0,
        sinkhorn_coarse=16, sinkhorn_polish=1)
    exact = gl.CONFIG2.replace(streaming=True, block_cols=512 * 512,
                               sinkhorn_iters=20)

    recs = []
    for seed in (1, 2, 3, 4):
        noisy = np.clip(gl.add_gaussian_noise(img, 0.1, seed=seed), 0, 1)
        plan = make_plan(noisy, base)
        _, _, z_exact = walls(noisy, exact, plan, rtt, sync, reps=1,
                              k_amort=1)
        psnr_exact = float(gl.psnr(img, z_exact))
        for it in (6, 8):
            cfg = base.replace(sinkhorn_iters=it)
            w, am, z = walls(noisy, cfg, plan, rtt, sync)
            p = float(gl.psnr(img, z))
            rec = {"recipe": f"scfold_it{it}_s{seed}", "side": 512,
                   "p": plan.p, "device_wall_s": round(w, 4),
                   "device_amort_ms": round(am * 1e3, 2),
                   "rtt_ms": round(rtt * 1e3, 2),
                   "psnr_out_db": round(p, 4),
                   "dpsnr_vs_exact_db": round(abs(p - psnr_exact), 4),
                   "config_hash": cfg.config_hash(), "ts": time.time()}
            if seed == 1 and orc is not None:
                rec["dpsnr_vs_oracle_db"] = round(
                    abs(p - float(gl.psnr(img, orc))), 4)
            recs.append(rec)
            print(json.dumps(rec), flush=True)

    RESULTS.parent.mkdir(parents=True, exist_ok=True)
    with RESULTS.open("a") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
