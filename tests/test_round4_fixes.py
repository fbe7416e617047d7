"""Round-4 regression tests: background-prefetch error propagation.

The trainer consumes every dataset through ``Prefetcher`` (a one-slot
producer thread, data/loader.py).  A crash inside the pipeline thread must
re-raise in the training loop — before r4 it drained as ``StopIteration``,
so a corrupt shard or a decode bug looked exactly like normal data
exhaustion and training "finished" early with a short run.
"""

import pytest

from simclr_tpu.data.loader import Prefetcher


class _Boom(RuntimeError):
    pass


def _gen_then_raise(n):
    for i in range(n):
        yield i
    raise _Boom("pipeline crashed")


def test_prefetcher_propagates_producer_exception():
    it = iter(Prefetcher(_gen_then_raise(3)))
    assert [next(it) for _ in range(3)] == [0, 1, 2]
    with pytest.raises(_Boom, match="pipeline crashed"):
        next(it)


def test_prefetcher_immediate_exception():
    it = iter(Prefetcher(_gen_then_raise(0)))
    with pytest.raises(_Boom):
        next(it)


def test_prefetcher_clean_exhaustion_still_stops():
    assert list(Prefetcher(iter(range(4)))) == [0, 1, 2, 3]


def test_compilation_cache_flag_populates_cache(tmp_path):
    """--compilation_cache_dir: compiles land in the directory so restarts
    (preemption resume, multi-host bring-up) skip the 20-40s first-jit."""
    import os

    import jax
    import jax.numpy as jnp

    from simclr_tpu.config import Config
    from simclr_tpu.utils import compilation_cache

    cache_dir = str(tmp_path / "xla_cache")
    # Snapshot EVERY config value maybe_enable touches, so cache-everything
    # thresholds don't leak into the rest of the pytest session.
    saved = {name: getattr(jax.config, name) for name in (
        "jax_compilation_cache_dir",
        "jax_persistent_cache_min_compile_time_secs",
        "jax_persistent_cache_min_entry_size_bytes",
        "jax_compilation_cache_max_size",
    )}
    try:
        compilation_cache.maybe_enable(Config(compilation_cache_dir=cache_dir))
        # A fresh (non-trivial, uncached-in-memory) computation.
        jax.jit(lambda x: jnp.sin(x) @ jnp.cos(x).T + 41.5)(
            jnp.ones((17, 23))).block_until_ready()
        assert os.path.isdir(cache_dir) and os.listdir(cache_dir)
        # Unset (None) is a no-op and idempotent re-enable doesn't reconfigure.
        compilation_cache.maybe_enable(Config())
        compilation_cache.maybe_enable(Config(compilation_cache_dir=cache_dir))
    finally:
        for name, value in saved.items():
            jax.config.update(name, value)
        compilation_cache._enabled_dir = None
