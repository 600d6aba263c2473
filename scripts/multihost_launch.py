"""Multi-host launch wrapper (BASELINE config 5; SURVEY.md §2.2 #11).

TPU-native replacement for the reference's mpiexec/SLURM cluster scripts:
instead of ``mpiexec -n P ./main``, every host runs this script with its
coordinator address; ``jax.distributed.initialize`` wires the hosts into one
JAX process group over DCN, and the (data, rows) mesh spans all chips.

    # on every host of the slice (TPU pods auto-detect all three args):
    python scripts/multihost_launch.py --frames frames.npy --out out.npy \
        [--coordinator host0:1234 --num_processes 4 --process_id $ID]

Each host feeds its local frame shard; XLA handles cross-host collectives.
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", required=True, help=".npy of (B, H, W) frames")
    ap.add_argument("--out", required=True)
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (auto-detected on TPU pods)")
    ap.add_argument("--num_processes", type=int, default=None)
    ap.add_argument("--process_id", type=int, default=None)
    ap.add_argument("--kernel", default="nlm")
    ap.add_argument("--sample", type=float, default=0.01)
    ap.add_argument("--eigvals", type=int, default=50)
    ap.add_argument("--n_data", type=int, default=None,
                    help="mesh data-axis size (default: #processes)")
    args = ap.parse_args()

    import jax
    if args.coordinator:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id)
    else:
        jax.distributed.initialize()    # TPU pod auto-detection

    import graphlap_tpu as gl
    from graphlap_tpu.models.video import filter_video
    from graphlap_tpu.parallel.mesh import make_mesh

    frames = np.load(args.frames)
    cfg = gl.PipelineConfig(kernel=args.kernel, sample_rho=args.sample,
                            num_eigvecs=args.eigvals,
                            affinity_dtype="bfloat16", streaming=False)
    n_data = args.n_data or jax.process_count()
    mesh = make_mesh(n_data=n_data,
                     n_rows=len(jax.devices()) // n_data)
    out, _ = filter_video(frames, cfg, mesh=mesh)
    if jax.process_index() == 0:
        np.save(args.out, out)
        print(f"wrote {args.out} {out.shape}")


if __name__ == "__main__":
    main()
