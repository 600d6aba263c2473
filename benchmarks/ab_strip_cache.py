"""A/B: cfg2 dense headline vs the strip_cache natural-order twin.

VERDICT r3 #3 (close the cfg2 dense-path gap): the round-3 dense profile
put the bare Pallas affinity emit at 8.8 ms but the full affinity stage
at 34 ms — the difference is dominated by the [A; B] N-row feature
permute the classic dense path needs. strip_cache runs the SAME recipe
class (bfloat16_store strip, coarse Sinkhorn 1/16 + 1 polish, randomized
sketch o206/p0) through the streaming model with a materialized
natural-order strip: no permutation anywhere.

Measures device-only walls (scalar-readback sync) for both, plus PSNR
parity of the strip_cache output vs the dense headline's and vs the f64
oracle snapshot (benchmarks/results/oracle_cfg2_512.npy) at the exact
bench workload. Appends to benchmarks/results/cfg2_sweep.jsonl.
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

import numpy as np

RESULTS = Path(__file__).parent / "results" / "cfg2_sweep.jsonl"
ORACLE_NPY = Path(__file__).parent / "results" / "oracle_cfg2_512.npy"


def device_wall(image2d, cfg, plan, reps=5):
    import jax.numpy as jnp
    from graphlap_tpu.models.pipeline import _filter_channel

    img = jax.device_put(jnp.asarray(image2d, jnp.float32))
    idx_a = jax.device_put(jnp.asarray(plan.idx_a))
    if cfg.streaming:
        perm = inv_perm = idx_a          # never read (streaming contract)
    else:
        perm = jax.device_put(jnp.asarray(plan.perm))
        inv_perm = jax.device_put(jnp.asarray(plan.inv_perm))
    sync = jax.jit(jnp.sum)
    z, _ = _filter_channel(img, idx_a, perm, inv_perm, cfg)
    float(sync(z))                       # compile + warm
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

    img = gl.make_test_image(512, 512)
    noisy = np.clip(gl.add_gaussian_noise(img, 0.1, seed=1), 0, 1)

    dense = gl.CONFIG2.replace(
        use_pallas=True, affinity_dtype="bfloat16_store", sinkhorn_iters=8,
        solver="sketch", sketch_oversample=206, sketch_power=0,
        sinkhorn_coarse=16, sinkhorn_polish=1)
    cache = gl.CONFIG2.replace(
        streaming=True, strip_cache=True, block_cols=512 * 512,
        use_pallas=True, affinity_dtype="bfloat16_store", sinkhorn_iters=8,
        solver="sketch", sketch_oversample=206, sketch_power=0,
        sinkhorn_coarse=16, sinkhorn_polish=1)
    plan = make_plan(noisy, dense)

    orc = np.load(ORACLE_NPY) if ORACLE_NPY.exists() else None
    recs = []
    outs = {}
    for name, cfg in (("dense_headline", dense),
                      ("strip_cache", cache),
                      ("strip_cache_nopallas", cache.replace(use_pallas=False))):
        wall, z = device_wall(noisy, cfg, plan)
        outs[name] = z
        rec = {"recipe": f"ab_{name}", "side": 512, "p": plan.p,
               "device_wall_s": round(wall, 4),
               "psnr_out_db": round(float(gl.psnr(img, z)), 4),
               "config_hash": cfg.config_hash(), "ts": time.time()}
        if orc is not None:
            rec["dpsnr_vs_oracle_db"] = round(
                abs(float(gl.psnr(img, z)) - float(gl.psnr(img, orc))), 4)
        recs.append(rec)
        print(json.dumps(rec), flush=True)
    d = float(gl.psnr(outs["dense_headline"], outs["strip_cache"]))
    recs.append({"recipe": "ab_strip_cache_vs_dense_agreement_db",
                 "value": round(d, 2), "ts": time.time()})
    print(json.dumps(recs[-1]), flush=True)

    RESULTS.parent.mkdir(parents=True, exist_ok=True)
    with RESULTS.open("a") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
