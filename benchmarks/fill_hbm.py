"""Fill the two remaining null peak_hbm_gib matrix rows (VERDICT r4 #8)
without re-running the full rows: compile the cfg5 batched-video chunk
executable and the row-8 per-tile executable and record their XLA
memory_analysis peaks as `hbm_fill` rows in matrix.jsonl. Compiles hit
the persistent TPU cache when warm; no timed device work runs.

    python benchmarks/fill_hbm.py            # real TPU
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

import numpy as np

RESULTS = Path(__file__).parent / "results" / "matrix.jsonl"


def emit(rec):
    RESULTS.parent.mkdir(parents=True, exist_ok=True)
    with RESULTS.open("a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    import graphlap_tpu as gl
    from run import _cfg5_recipe, row8
    from graphlap_tpu.models.pipeline import make_plan
    from graphlap_tpu.parallel.mesh import make_mesh
    from graphlap_tpu.utils.meminfo import peak_hbm_gib, video_hbm_analysis

    # cfg5: the 16x4K row streams 2-frame chunks; the 2x4K row is the
    # same chunk executable — one analysis covers both shapes
    cfg5 = _cfg5_recipe()
    frame = np.zeros((2160, 3840), np.float32)
    plan5 = make_plan(frame, cfg5)
    mesh = make_mesh()
    ma = video_hbm_analysis((2, 2160, 3840), cfg5, plan5, mesh)
    emit({"row": "hbm_fill_cfg5_video_4k_chunk2",
          "fills": ["cfg5_video_2x4k_streaming", "cfg5_video_16x4k_streaming"],
          "backend": jax.default_backend(),
          "config_hash": cfg5.config_hash(),
          "peak_hbm_gib": (round(ma["total"] / 2**30, 3) if ma else None),
          "peak_hbm_source": "memory_analysis" if ma else "unavailable",
          "hbm_breakdown_gib": ({k: round(v / 2**30, 3)
                                 for k, v in ma.items()} if ma else None),
          "ts": time.time()})

    # row 8: the tiled mode reuses ONE per-tile executable; its footprint
    # is what must fit HBM (run_tiled_row computes the same quantity)
    _, cfg8, _, _ = row8()
    tile = 4096
    tplan = make_plan(np.zeros((tile, tile), np.float32), cfg8)
    peak, src = peak_hbm_gib((tile, tile), cfg8, tplan)
    emit({"row": "hbm_fill_cfg8_128mp_tiled_per_tile",
          "fills": ["cfg8_128mp_tiled"], "tile": tile,
          "backend": jax.default_backend(),
          "config_hash": cfg8.config_hash(),
          "peak_hbm_gib": peak, "peak_hbm_source": src,
          "ts": time.time()})


if __name__ == "__main__":
    main()
