"""Persistent-compile-cache location, keyed by the host's CPU features.

XLA:CPU serializes ahead-of-time-compiled executables specialized to the
COMPILING machine's CPU features, and JAX's persistent-cache key does not
include them — so after a VM migration, entries written by the previous
host deserialize into code using unavailable instructions. Observed here
2026-08-18: the test suite died with SIGSEGV inside
``compilation_cache.get_executable_and_time`` loading entries whose
compile features (``+prefer-no-scatter`` era avx512 set) no longer
matched the host, exactly the "could lead to execution errors such as
SIGILL" case XLA warns about. Keying the cache directory by a hash of
``/proc/cpuinfo``'s flags makes a migration start a fresh subdirectory
(cold recompiles) instead of crashing; TPU entries are re-created too —
an acceptable one-off cost, and TPU executables must be re-validated on
a new host pairing anyway.

Every entry point that enables the cache (tests/conftest.py,
__graft_entry__.py, bench.py, benchmarks/*, scripts/*) routes through
:func:`setup_compilation_cache`. NB the config API is the only way to
set this on this box — jax is pre-imported at interpreter startup, so
``os.environ['JAX_COMPILATION_CACHE_DIR']`` is a silent no-op
(CLAUDE.md environment traps).
"""

from __future__ import annotations

import hashlib
import os


def host_tag() -> str:
    """Short stable tag of this host's CPU feature set. x86 cpuinfo
    carries ``flags``, aarch64 carries ``Features``; the machine/model
    lines fold in too so hosts that expose neither (some hypervisors)
    still separate by CPU model rather than sharing one subdir."""
    import platform

    lines = []
    try:
        with open("/proc/cpuinfo") as f:
            for ln in f:
                if ln.startswith(("flags", "Features", "model name",
                                  "CPU implementer", "CPU part")):
                    lines.append(ln.strip())
                    if len(lines) >= 4:
                        break
    except OSError:
        pass  # non-procfs platform: machine arch still separates below
    key = "|".join([platform.machine()] + lines)
    return hashlib.sha256(key.encode()).hexdigest()[:10]


def cache_dir(repo_root: str | os.PathLike) -> str:
    return os.path.join(str(repo_root), ".jax_cache", f"host-{host_tag()}")


def setup_compilation_cache(repo_root: str | os.PathLike,
                            cpu: bool = False) -> str | None:
    """Point JAX's persistent compile cache at the host-keyed subdir.

    ``cpu=True`` (callers that force the CPU backend: tests/conftest.py,
    CPU-side scripts) DISABLES the persistent cache instead: jaxlib's
    XLA:CPU AOT executable (de)serialization segfaulted this box's full
    test suite three times at the ~90% mark — in ``executable.serialize()``
    once and ``backend.deserialize_executable()`` twice, always ~200
    tests into one process while the same entries (de)serialize fine in
    a fresh process — so the cache's C++ AOT path appears to exhaust a
    per-process resource under many live executables. The CPU suite
    predates the working cache (it was silently disabled until round 3)
    and runs in the same ~8 min without it; TPU runs keep the cache —
    their executables never touch the XLA:CPU AOT loader, and the 512^2
    entry's 50 s cold compile is exactly what the cache is for."""
    import jax

    if cpu:
        jax.config.update("jax_compilation_cache_dir", None)
        return None
    path = cache_dir(repo_root)
    jax.config.update("jax_compilation_cache_dir", path)
    return path
