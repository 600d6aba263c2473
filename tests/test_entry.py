"""Driver-contract smoke tests: __graft_entry__ and bench plumbing."""

import json
import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge
    fwd, args = ge.entry()
    out = jax.jit(fwd)(*args)
    assert out.shape == args[0].shape
    assert bool(jax.numpy.isfinite(out).all())


def test_dryrun_multichip_eight():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_dryrun_multichip_two():
    import __graft_entry__ as ge
    ge.dryrun_multichip(2)


def test_bench_contract_keys():
    """bench.py main() must print one JSON object with the driver keys."""
    import bench
    assert bench.RUNS >= 1
    assert bench.MEGAPIXELS > 0
    # workload builds without device work
    gl, cfg, img, noisy = bench.make_workload(pallas=True)
    assert cfg.use_pallas and img.shape == (bench.H, bench.W)
