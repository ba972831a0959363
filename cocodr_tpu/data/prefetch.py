"""Background-prefetching batch pipeline.

The reference leans on torch DataLoader worker processes; here a small
thread pool keeps N batches of (gathered, device_put) data in flight so the
TPU never waits on the host (the native C++ gather releases the GIL during
its memcpy loops, so one Python thread overlaps cleanly with dispatch).
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax


class PrefetchIterator:
    """Wraps a batch-producing iterator; keeps `depth` batches prefetched
    (optionally already device_put)."""

    _SENTINEL = object()

    def __init__(
        self,
        source: Iterator,
        depth: int = 2,
        device_put: bool = True,
        transform: Optional[Callable] = None,
    ):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err: Optional[BaseException] = None
        self._transform = transform
        self._device_put = device_put
        self._thread = threading.Thread(
            target=self._fill, args=(source,), daemon=True
        )
        self._thread.start()

    def _fill(self, source):
        try:
            for item in source:
                if self._transform is not None:
                    item = self._transform(item)
                if self._device_put:
                    item = jax.tree_util.tree_map(jax.device_put, item)
                self._q.put(item)
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
        finally:
            self._q.put(self._SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch(source: Iterator, depth: int = 2, device_put: bool = True,
             transform: Optional[Callable] = None) -> PrefetchIterator:
    return PrefetchIterator(source, depth, device_put, transform)
