"""Persistent XLA compilation cache wiring (--compilation_cache_dir).

The reference has no analogue: TF's TPUEstimator re-traces and re-compiles
the graph on every process start (run.py:391-399 bring-up).  Under JAX the
first `jit` of the R50 train step costs 20-40s per process; pointing every
process of a job (and every restart — preemption resume, continuous eval,
elastic re-mesh) at one cache directory makes recompiles a disk read.

Safe to share across processes: entries are keyed by a hash of the
computation + compile options + backend, and writes go through a temp file
rename, so concurrent writers of the same key are idempotent.
"""

from __future__ import annotations

import logging

import jax

log = logging.getLogger("simclr_tpu")

_enabled_dir = None


def maybe_enable(config) -> None:
    """Idempotently point JAX's persistent compilation cache at
    ``config.compilation_cache_dir`` (no-op when unset)."""
    global _enabled_dir
    cache_dir = getattr(config, "compilation_cache_dir", None)
    if not cache_dir or _enabled_dir == cache_dir:
        return
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache every entry: the default 1s/small-entry thresholds skip exactly
    # the many small jits (metrics, eval masks, init) whose compiles
    # dominate a restart on a slow host.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    # Caching everything means a directory shared across many runs grows
    # without limit; bound it with JAX's LRU eviction so long-lived shared
    # caches self-trim instead of accumulating thousands of stale entries.
    jax.config.update("jax_compilation_cache_max_size",
                      getattr(config, "compilation_cache_max_size_mb", 4096)
                      * 1024 * 1024)
    _enabled_dir = cache_dir
    log.info("persistent compilation cache at %s", cache_dir)
