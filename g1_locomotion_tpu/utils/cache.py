"""Persistent XLA compilation cache.

The fused engine's first compile costs minutes (CPU ~2-5 min, TPU over the
remote-compile tunnel ~3-10 min) — the dominant cost of every test run,
experiment sweep, and demo restart. XLA executables are shape-keyed and
deterministic, so a disk cache turns every repeat invocation with unchanged
code/shapes into a load (measured: 113 s -> 34 s for the batched MPC on CPU;
the residual is Python tracing, not XLA).

Call :func:`enable_persistent_cache` early (conftest.py and the tools/ do).
The reference has no analogue — its C++ is AOT-compiled by catkin; this is
the JIT-world equivalent of shipping prebuilt binaries.
"""

from __future__ import annotations

import hashlib
import os
import platform

DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def _machine_tag() -> str:
    """Host fingerprint for the cache subdirectory.

    XLA:CPU cache keys do NOT include the exact host CPU features; an entry
    AOT-compiled on one machine loads on another with a "could lead to
    SIGILL" warning and non-identical code paths (observed round 2 when the
    build hosts rotated). Scoping the cache per (arch, cpu-flags) makes
    foreign entries invisible instead of trusted.
    """
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = line
                    break
    except OSError:
        pass
    h = hashlib.sha1(flags.encode()).hexdigest()[:10]
    return f"{platform.machine()}-{h}"


def enable_persistent_cache(path: str | None = None, min_compile_secs: float = 1.0):
    """Point JAX's compilation cache at a repo-local, machine-scoped directory.

    Safe to call multiple times; respects an explicit
    ``JAX_COMPILATION_CACHE_DIR`` in the environment.
    """
    import jax

    base = os.environ.get("JAX_COMPILATION_CACHE_DIR") or path or DEFAULT_DIR
    cache_dir = os.path.join(base, _machine_tag())
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    return cache_dir
