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
