"""BackgroundPrefetcher: ordering, exception propagation, bounded depth."""
import time

import pytest

from flash_vstream_tpu.utils.prefetch import BackgroundPrefetcher


def test_prefetch_order_and_completion():
    out = list(BackgroundPrefetcher(lambda i: i * i, 3, 9))
    assert out == [9, 16, 25, 36, 49, 64]


def test_prefetch_propagates_exceptions():
    def make(i):
        if i == 2:
            raise ValueError("boom at 2")
        return i

    it = iter(BackgroundPrefetcher(make, 0, 5))
    assert next(it) == 0
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom at 2"):
        list(it)


def test_prefetch_runs_ahead_of_consumer():
    produced = []

    def make(i):
        produced.append(i)
        return i

    pf = BackgroundPrefetcher(make, 0, 4, depth=2)
    time.sleep(0.2)
    # producer filled the buffer without any consumption (depth 2 + 1 in
    # flight is the ceiling)
    assert len(produced) >= 2
    assert list(pf) == [0, 1, 2, 3]


def test_prefetch_close_unblocks_producer():
    def make(i):
        return bytes(1000)

    pf = BackgroundPrefetcher(make, 0, 100, depth=1)
    next(iter(pf))
    pf.close()
    assert not pf._thread.is_alive()
