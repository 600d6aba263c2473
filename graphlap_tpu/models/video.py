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
    if frames.ndim == 4:
        # (B, H, W, C) color video: channels are independent pipelines that
        # share the sampling plan (same geometry), so fold them into the
        # batch axis (B*C gray frames) and unfold after — pure DP, every
        # existing chunking/sharding path reused unchanged
        if cfg.rgb_mode != "per_channel":
            raise ValueError(
                "filter_video supports rgb_mode='per_channel' only (each "
                "channel is an independent frame in the batch); use "
                "filter_image for luma_basis on single images")
        b, h, w, c = frames.shape
        flat = np.moveaxis(frames, -1, 1).reshape(b * c, h, w)
        z, vals = filter_video(flat, cfg, mesh=mesh, plan=plan,
                               frames_per_step=frames_per_step)
        return (np.moveaxis(z.reshape(b, c, h, w), 1, -1),
                vals.reshape(b, c, *vals.shape[1:]))
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

    if not cfg.streaming:
        # same guard as the single-image entries (pipeline.py
        # check_dense_feasible): a 4K frame's dense strip is ~136 GB f32,
        # which dies in an opaque XLA allocation error mid-compile
        from .pipeline import DENSE_STRIP_BYTES_LIMIT
        # the sharded dense builder materializes its strip in f32 always
        # (parallel/sharded.py doesn't thread a storage dtype), so count 4
        # bytes regardless of affinity_dtype — undercounting here brings
        # back the opaque mid-compile XLA allocation death this guard
        # exists to prevent
        per_device = (plan.p * plan.n * 4 * step) / mesh.devices.size
        if per_device > DENSE_STRIP_BYTES_LIMIT:
            raise ValueError(
                f"dense K strips would need {per_device / 1e9:.1f} GB per "
                f"device (p={plan.p}, N={plan.n}, {step} frames/step over "
                f"{mesh.devices.size} devices) — past the "
                f"{DENSE_STRIP_BYTES_LIMIT / 1e9:.0f} GB bound. Use "
                f"cfg.replace(streaming=True) or a smaller frames_per_step.")

    import jax.numpy as jnp
    idx_a = jnp.asarray(plan.idx_a)
    if cfg.streaming:
        # strip-free batched path: frames on 'data', pixel blocks on 'rows'
        # (config 5's real shape — a 4K frame's dense strip is ~136 GB f32,
        # so the dense path below cannot run it at all)
        from ..parallel.streaming_sharded import build_streaming_sharded_batch
        srun = build_streaming_sharded_batch(mesh, cfg)
        run = lambda ch: srun(ch, idx_a)
    else:
        drun = build_sharded_pipeline(mesh, cfg)
        perm = jnp.asarray(plan.perm)
        inv_perm = jnp.asarray(plan.inv_perm)
        run = lambda ch: drun(ch, idx_a, perm, inv_perm)

    # Pipelined chunks: JAX dispatch is async, so keeping a small window
    # of chunks in flight lets chunk i+1's host prep + upload overlap
    # chunk i's device compute instead of serializing
    # upload -> compute -> download per chunk (measured 59 -> 37 s on the
    # 16x4K shape — the e2e wall on this box is tunnel-transfer-bound).
    # The window is BOUNDED so peak device memory stays O(window x chunk),
    # not O(total video): each chunk holds its padded input + output live
    # until materialized.
    window = 4
    pending, outs, vals = [], [], []

    def _drain(slot):
        z, v, keep = slot
        outs.append(np.asarray(z)[:keep])
        vals.append(np.asarray(v)[:keep])

    for lo in range(0, b, step):
        chunk = frames[lo:lo + step]
        keep = len(chunk)
        pad = (-keep) % step
        if pad:                      # keep the compiled shape static
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
        z, v = run(jnp.asarray(chunk))
        pending.append((z, v, keep))
        if len(pending) >= window:
            _drain(pending.pop(0))
    for slot in pending:
        _drain(slot)
    return np.concatenate(outs), np.concatenate(vals)


def filter_video_multihost(local_frames: np.ndarray, cfg: PipelineConfig,
                           mesh, plan: SamplePlan | None = None):
    """Multi-process entry (DCN analogue of the reference's MPI launch,
    SURVEY.md §5 comm-backend row): every process passes its LOCAL
    (B_local, H, W) frame shard; the shards are assembled into one global
    jax.Array over the mesh's ``data`` axis
    (``jax.make_array_from_process_local_data`` — never a replicated copy),
    the sharded jit runs once across all processes, and the full output is
    allgathered back to every process.

    Requires ``jax.distributed.initialize()`` to have run (see
    scripts/multihost_launch.py) and the mesh to span all processes'
    devices. B_global = B_local * process_count must be divisible by the
    mesh's data-axis size. Returns (frames (B_global, H, W), vals)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    local_frames = np.asarray(local_frames, np.float32)
    if local_frames.ndim == 4:
        # color video: fold channels into the local batch (see filter_video)
        if cfg.rgb_mode != "per_channel":
            raise ValueError("filter_video_multihost supports "
                             "rgb_mode='per_channel' only")
        b, h, w, c = local_frames.shape
        flat = np.moveaxis(local_frames, -1, 1).reshape(b * c, h, w)
        z, vals = filter_video_multihost(flat, cfg, mesh, plan=plan)
        bg = z.shape[0] // c
        return (np.moveaxis(z.reshape(bg, c, h, w), 1, -1),
                vals.reshape(bg, c, *vals.shape[1:]))
    if local_frames.ndim != 3:
        raise ValueError(f"expected (B_local, H, W), got {local_frames.shape}")
    nproc = jax.process_count()
    b_global = local_frames.shape[0] * nproc
    n_data = mesh.devices.shape[0]
    if b_global % n_data != 0:
        raise ValueError(f"B_global={b_global} not divisible by mesh "
                         f"data axis {n_data}")
    if plan is None:
        plan = make_plan(local_frames[0], cfg)   # shape-only: identical on
                                                 # every process by design
    sharding = NamedSharding(mesh, P("data", None, None))
    global_frames = jax.make_array_from_process_local_data(
        sharding, local_frames, (b_global, *local_frames.shape[1:]))

    idx_a = jnp.asarray(plan.idx_a)
    if cfg.streaming:
        from ..parallel.streaming_sharded import build_streaming_sharded_batch
        run = build_streaming_sharded_batch(mesh, cfg)
        z, vals = run(global_frames, idx_a)
    else:
        run = build_sharded_pipeline(mesh, cfg)
        z, vals = run(global_frames, idx_a, jnp.asarray(plan.perm),
                      jnp.asarray(plan.inv_perm))
    z = multihost_utils.process_allgather(z, tiled=True)
    vals = multihost_utils.process_allgather(vals, tiled=True)
    return np.asarray(z), np.asarray(vals)
