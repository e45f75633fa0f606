"""Persistent XLA compilation cache.

The reference pays its compile cost once, at build time (nvcc AOT,
``TestProject.vcxproj``); XLA compiles at runtime, and a fresh Pallas
kernel build on the remote v5e takes minutes.  JAX's persistent
compilation cache is the runtime equivalent of the reference's build
artifacts: compiled executables are keyed by (program, compiler flags,
device kind) and reloaded on the next process start.

Enabled by default from the CLI and bench entry points; opt out with
``NBODY_COMPCACHE=off`` (or point ``NBODY_COMPCACHE`` at a directory).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = "~/.cache/nbody_tpu/xla"


def enable_compilation_cache(path: "str | None" = None) -> "str | None":
    """Turn on JAX's persistent compilation cache (idempotent).

    Returns the cache directory, or None when disabled/unsupported.
    Never raises: an unwritable directory or an older jax just leaves
    caching off (first-compile cost only — no behavior change).
    """
    env = os.environ.get("NBODY_COMPCACHE", "")
    if env.lower() in ("off", "0", "none", "disable", "disabled"):
        return None
    path = path or (env if env else None) or os.path.expanduser(_DEFAULT_DIR)
    try:
        import jax
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Cache aggressively: remote-relay compiles are the dominant
        # session cost, so even small programs are worth persisting.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        try:
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except Exception:
            pass   # older jax: flag absent; default is fine
        return path
    except Exception:
        return None
