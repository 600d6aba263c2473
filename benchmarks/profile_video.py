"""Device-wall A/B of the three ways to run a frame batch on one chip:
sequential single-frame jits, plain vmap, and the (data, rows)-sharded
batched pipeline. Diagnoses why/when batching pays (VERDICT r1 weak #4).

    python benchmarks/profile_video.py [B] [side]
Appends to benchmarks/results/profile_video.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
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

RESULTS = Path(__file__).parent / "results" / "profile_video.jsonl"


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    side = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    import jax
    import jax.numpy as jnp
    import graphlap_tpu as gl
    from graphlap_tpu.models.pipeline import make_plan
    from graphlap_tpu.models.streaming import filter_channel_streaming
    from graphlap_tpu.parallel.mesh import make_mesh
    from graphlap_tpu.parallel.streaming_sharded import (
        build_streaming_sharded_batch,
    )

    cfg = gl.PipelineConfig(kernel="nlm", h=0.25, sample_rho=0.005,
                            num_eigvecs=50, sinkhorn_iters=10,
                            affinity_dtype="bfloat16", streaming=True,
                            block_cols=32768, gram_coarse=4)
    frames = np.stack([
        np.clip(gl.add_gaussian_noise(gl.make_test_image(side, side, seed=s),
                                      0.1, seed=s), 0, 1)
        for s in range(b)
    ]).astype(np.float32)
    plan = make_plan(frames[0], cfg)
    idx_a = jax.device_put(jnp.asarray(plan.idx_a))
    perm = jax.device_put(jnp.asarray(plan.perm))
    inv_perm = jax.device_put(jnp.asarray(plan.inv_perm))
    fr_dev = jax.device_put(jnp.asarray(frames))
    sync = jax.jit(jnp.sum)

    def wall(fn, reps=3):
        float(sync(fn()))                  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(sync(fn()))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # (a) sequential single-frame jits
    def seq():
        outs = [filter_channel_streaming(fr_dev[s], idx_a, perm, inv_perm,
                                         cfg)[0]
                for s in range(b)]
        return jnp.stack(outs)

    # (b) plain vmap of the single-frame streaming fn (no mesh machinery)
    vm = jax.jit(jax.vmap(
        lambda f: filter_channel_streaming(f, idx_a, perm, inv_perm, cfg)[0]))

    # (c) (data, rows)-sharded batched pipeline on the 1-chip mesh
    brun = build_streaming_sharded_batch(make_mesh(), cfg)

    walls = {
        "sequential_jits": wall(seq),
        "plain_vmap": wall(lambda: vm(fr_dev)),
        "sharded_batch": wall(lambda: brun(fr_dev, idx_a)[0]),
    }
    mp = frames.size / 1e6
    rec = {"b": b, "side": side, "p": plan.p,
           "backend": jax.default_backend(),
           "walls_s": {k: round(v, 4) for k, v in walls.items()},
           "mp_per_s": {k: round(mp / v, 3) for k, v in walls.items()},
           "ts": time.time()}
    RESULTS.parent.mkdir(parents=True, exist_ok=True)
    with RESULTS.open("a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
