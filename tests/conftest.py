"""Test env: force the CPU backend with 8 fake devices.

SURVEY.md §4.3 — ``xla_force_host_platform_device_count=8`` gives 8 virtual
CPU devices so shard_map/pjit tests validate the multi-chip path without a
real TPU slice. Must run before the first ``import jax`` anywhere, hence the
env mutation at conftest import time. TPU integration runs live in bench.py /
benchmarks/run.py, not the unit suite.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin on this box ignores the JAX_PLATFORMS env var; the
# config API is the only thing that actually forces the CPU backend.
jax.config.update("jax_platforms", "cpu")

# NO persistent compile cache for the CPU suite: jaxlib's XLA:CPU AOT
# (de)serialization segfaulted the run at ~90% three times on this box
# (rationale + evidence in graphlap_tpu/utils/cache.py). The suite ran
# at the same ~8 min before the cache ever worked, so this costs nothing.
# NB: jax is PRE-IMPORTED at interpreter startup on this box (a .pth
# hook), so the JAX_COMPILATION_CACHE_DIR env var set from Python is a
# silent no-op — only the config API works (the same trap as
# JAX_PLATFORMS).
import sys  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from graphlap_tpu.utils.cache import setup_compilation_cache  # noqa: E402

setup_compilation_cache(os.path.join(os.path.dirname(__file__), ".."),
                        cpu=True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Self-sufficient on a fresh checkout: the native codec extension is built
# from source (no committed binaries — ADVICE r1), so build it in-place once
# if it is missing. tests/test_native.py asserts it imports afterwards.
def _ensure_native_built():
    import glob
    import subprocess
    import sys

    # Decide from the filesystem, NOT by importing the package: a failed
    # ``from . import _native`` leaves a stale ``_native = None`` attribute
    # that a later reload would silently return instead of the fresh .so.
    root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    if glob.glob(os.path.join(root, "graphlap_tpu", "native", "_native*.so")):
        return
    proc = subprocess.run(
        [sys.executable, "setup.py", "build_ext", "--inplace"],
        cwd=root, check=False, capture_output=True, text=True, timeout=300)
    if proc.returncode != 0:
        # don't abort the session (numpy fallbacks keep most tests valid),
        # but leave the compiler error visible instead of a bare import
        # assertion in test_native
        sys.stderr.write("WARNING: native extension in-place build failed "
                         f"(rc={proc.returncode}):\n{proc.stderr[-2000:]}\n")


_ensure_native_built()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _release_executables_per_module():
    """XLA:CPU segfaults this box once ~200 compiled executables are
    live in one process (reproduced 4x at the ~90% mark of a full run,
    in backend_compile_and_load with the persistent cache disabled and
    in the cache's AOT serialize/deserialize with it enabled — the same
    programs compile fine in a fresh process, and RAM is not the limit).
    Dropping JAX's in-memory jit caches at each module boundary frees
    the loaded executables and keeps one pytest process — the driver's
    invocation — under the threshold. Costs only cross-module compile
    reuse, which is near zero here (modules use distinct configs)."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()
