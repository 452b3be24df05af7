"""Background host-side batch prefetch.

Training batches are assembled on host (JPEG decode, resize, tokenize,
collate) while the device runs the previous step; a one-thread double buffer
overlaps the two (the reference gets this from torch DataLoader workers,
train.py:1031; here a thread suffices since jax dispatch is async).
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator


class BackgroundPrefetcher:
    """Runs `make(i)` for i in [start, stop) on a background thread, keeping
    up to `depth` results ready. Exceptions re-raise on the consumer side."""

    _SENTINEL = object()

    def __init__(self, make: Callable[[int], object], start: int, stop: int,
                 depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err = None

        def run():
            try:
                for i in range(start, stop):
                    self._q.put(make(i))
            except BaseException as e:     # noqa: BLE001 — re-raised below
                self._err = e
            finally:
                self._q.put(self._SENTINEL)

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def __iter__(self) -> Iterator:
        while True:
            item = self._q.get()
            if item is self._SENTINEL:
                if self._err is not None:
                    raise self._err
                return
            yield item

    def close(self):
        # drain so the producer can exit, then join
        while self._thread.is_alive():
            try:
                self._q.get(timeout=0.1)
            except queue.Empty:
                pass
        self._thread.join(timeout=5)
