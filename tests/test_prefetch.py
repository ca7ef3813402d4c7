"""Prefetching input-pipeline tests."""
import time

import numpy as np
import pytest

from gastx.data.prefetch import prefetch_to_device


def test_prefetch_preserves_order_and_values():
    items = list(range(20))
    out = list(prefetch_to_device(iter(items), lambda x: x * 2))
    assert out == [x * 2 for x in items]


def test_prefetch_overlaps_producer_and_consumer():
    def slow_source():
        for i in range(6):
            time.sleep(0.05)
            yield i

    t0 = time.perf_counter()
    for _ in prefetch_to_device(slow_source(), lambda x: x):
        time.sleep(0.05)  # consumer work
    elapsed = time.perf_counter() - t0
    # serial would be ~0.6s; overlapped ~0.35s. Bound chosen with slack
    # for scheduler jitter on the 1-core CI host (a parallel XLA compile
    # can hold the core) while still failing a fully-serial pipeline.
    assert elapsed < 0.57


def test_prefetch_propagates_exceptions():
    def bad_source():
        yield 1
        raise ValueError("boom")

    it = prefetch_to_device(bad_source(), lambda x: x)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        list(it)


def test_prefetch_early_abandon_stops_producer():
    """Breaking out of the consumer (e.g. a train-step exception) must not
    leave the producer thread parked in q.put holding staged batches."""
    import threading

    produced = []
    started = threading.active_count()

    def source():
        for i in range(1000):
            produced.append(i)
            yield i

    gen = prefetch_to_device(source(), lambda x: x, buffer_size=2)
    for x in gen:
        if x == 3:
            break
    gen.close()  # GeneratorExit -> stop event -> producer unblocks

    deadline = 50
    while threading.active_count() > started and deadline > 0:
        import time
        time.sleep(0.1)
        deadline -= 1
    assert threading.active_count() <= started
    assert len(produced) < 1000  # producer stopped early, not exhausted
