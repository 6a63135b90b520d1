"""Persistent XLA compilation cache setup, machine-scoped.

The suite/bench share a persistent compile cache for fast reruns.
Cached XLA:CPU executables are AOT-compiled against the COMPILING
host's CPU features; loading them on a host with different features is
undefined (cpu_aot_loader warns "could lead to execution errors such as
SIGILL") and was the root cause of the reproducible-but-flaky pytest
worker segfaults across rounds (crash stack: compilation_cache.
get_executable_and_time during a cache read) — /tmp/tsar_jax_cache
outlived the machine that wrote it. The default cache directory
therefore carries a fingerprint of the host's CPU flags; a different
machine gets a fresh cache instead of foreign binaries.

TSAR_JAX_CACHE still overrides the full path (same-machine reruns and
tests rely on it).
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path


def cache_dir() -> str:
    env = os.environ.get("TSAR_JAX_CACHE")
    if env:
        return env
    try:
        info = Path("/proc/cpuinfo").read_text()
        flags = next((ln for ln in info.splitlines()
                      if ln.startswith("flags")), info[:4096])
    except OSError:
        import platform
        flags = platform.processor() + platform.machine()
    # cpuinfo flags alone are NOT sufficient: XLA:CPU AOT results also
    # bake in compiler-version-dependent target features (observed:
    # `+prefer-no-scatter` entries from another fleet machine whose
    # cpuinfo flag string hashed identically — loading them warns
    # SIGILL). Fold the jaxlib version into the fingerprint.
    try:
        import jaxlib
        flags += jaxlib.__version__
    except Exception:  # noqa: BLE001 — fingerprint best-effort
        pass
    tag = hashlib.sha1(flags.encode()).hexdigest()[:10]
    # Concurrent xdist workers also get private caches: a reader hitting
    # another process's in-flight write segfaults in the executable
    # deserializer (observed crash stack: get_executable_and_time).
    worker = os.environ.get("PYTEST_XDIST_WORKER")
    suffix = f"_{worker}" if worker else ""
    return f"/tmp/tsar_jax_cache_{tag}{suffix}"


def setup_compilation_cache(min_compile_secs: float = 5.0) -> str:
    import jax
    path = cache_dir()
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return path
