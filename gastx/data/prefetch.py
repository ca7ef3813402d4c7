"""Asynchronous host->device input prefetching.

The reference copies each batch numpy->device synchronously inside the train
loop (main.py:218-223). SURVEY.md §2.7 calls for a double-buffered pipeline:
a background thread assembles the next host batch (the vectorized gathers of
ChunkedBatcher) and stages its device_put while the current step runs, so
host batch assembly and H2D transfer overlap device compute.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional


class _Stop:
    pass


def prefetch_to_device(iterator: Iterator, transform: Callable,
                       buffer_size: int = 2) -> Iterator:
    """Wrap a host batch iterator; ``transform`` maps a host batch to device
    arrays (e.g. shard_batch + padding). Batches are transformed in a
    background thread, ``buffer_size`` deep.

    Exceptions in the producer are re-raised at the consumer.
    """
    q: "queue.Queue" = queue.Queue(maxsize=buffer_size)

    def producer():
        try:
            for item in iterator:
                q.put(transform(item))
        except BaseException as exc:  # propagate to consumer
            q.put(exc)
            return
        q.put(_Stop())

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()

    while True:
        item = q.get()
        if isinstance(item, _Stop):
            break
        if isinstance(item, BaseException):
            raise item
        yield item
    thread.join()
