"""Batch / video denoising: frames streamed through the pipeline.

BASELINE config 5 ("16x 4K frames streamed through the pipeline on a
multi-host v4-32 mesh"). The reference is a single-image tool
(SURVEY.md §3.5); this is pure data parallelism over the mesh's ``data``
axis with per-frame independent eigenbases — DCN only at input
distribution, everything else local to each frame's shard group.

Single-process: frames are chunked over the local mesh. Multi-host: call
``jax.distributed.initialize()`` first (scripts/multihost_launch.py), build
the mesh over all devices, and feed each host its local frame shard.
"""

from __future__ import annotations

import numpy as np

from ..config import PipelineConfig
from ..utils.sampling import SamplePlan
from ..parallel.mesh import make_mesh
from ..parallel.sharded import build_sharded_pipeline
from .pipeline import make_plan


def filter_video(frames: np.ndarray, cfg: PipelineConfig,
                 mesh=None, plan: SamplePlan | None = None,
                 frames_per_step: int | None = None):
    """Filter (B, H, W) grayscale frames. Returns (filtered, eigvals).

    All frames share one sampling plan (same geometry); each frame gets its
    own affinity graph and eigenbasis. ``frames_per_step`` bounds per-step
    memory: the batch is processed in chunks of that many frames (each chunk
    one sharded jit step; same compiled executable reused across chunks).
    """
    frames = np.asarray(frames, np.float32)
    if frames.ndim != 3:
        raise ValueError(f"expected (B, H, W) frames, got {frames.shape}")
    b = frames.shape[0]
    if plan is None:
        plan = make_plan(frames[0], cfg)
    if mesh is None:
        mesh = make_mesh()          # all local devices on the rows axis
    n_data = mesh.devices.shape[0]

    if frames_per_step is None:
        frames_per_step = max(n_data, 1)
    step = max((frames_per_step // n_data) * n_data, n_data)

    run = build_sharded_pipeline(mesh, cfg)
    import jax.numpy as jnp
    idx_a = jnp.asarray(plan.idx_a)
    perm = jnp.asarray(plan.perm)
    inv_perm = jnp.asarray(plan.inv_perm)

    outs, vals = [], []
    for lo in range(0, b, step):
        chunk = frames[lo:lo + step]
        pad = (-len(chunk)) % step
        if pad:                      # keep the compiled shape static
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
        z, v = run(jnp.asarray(chunk), idx_a, perm, inv_perm)
        z = np.asarray(z)[: len(chunk) - pad if pad else len(chunk)]
        v = np.asarray(v)[: z.shape[0]]
        outs.append(z)
        vals.append(v)
    return np.concatenate(outs), np.concatenate(vals)
