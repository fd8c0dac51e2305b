"""Persistent XLA compilation cache for fast cold starts.

Serving and training compile a small fixed family of executables (the
bucketed static shapes, docs/PERF.md "Serving shapes"); persisting the
compiled artifacts means a restarted server or trainer skips every
recompile — observability the reference cannot have (eager torch has no
AOT surface). The tunneled dev platform still pays its one-time
executable *upload* per process; on directly-attached hosts the cache
removes the whole cold-start compile cost.

Respects a dir the embedding application already configured; opt out with
VOW_NO_COMPILE_CACHE=1.
"""
from __future__ import annotations

import os
import tempfile

import jax


def enable_persistent_cache(cache_dir: str | None = None,
                            min_compile_seconds: float = 0.5) -> str | None:
    """Enable jax's persistent compilation cache; returns the active dir
    (None when opted out). Safe to call repeatedly and from libraries: an
    already-configured dir wins unless an explicit cache_dir is given."""
    if os.environ.get("VOW_NO_COMPILE_CACHE"):
        return None
    configured = jax.config.jax_compilation_cache_dir
    if configured is not None and cache_dir is None:
        return configured
    d = str(cache_dir or os.path.join(tempfile.gettempdir(), "vow_jax_cache"))
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_seconds))
    return d
