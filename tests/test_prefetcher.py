"""Prefetcher: order preservation, overlap, and worker-exception propagation."""

import threading
import time

import pytest

from idvs.morec_tpu.data.vision_loader import Prefetcher


def test_order_and_completeness():
    out = list(Prefetcher(range(50), lambda x: x * 2))
    assert out == [x * 2 for x in range(50)]


def test_runs_ahead_of_consumer():
    """fn for item N+1 runs while the consumer still holds item N."""
    started = []
    gate = threading.Event()

    def fn(x):
        started.append(x)
        return x

    pf = Prefetcher(range(5), fn, depth=2)
    it = iter(pf)
    first = next(it)
    # give the worker a moment: with depth=2 it should have produced items
    # beyond the one we consumed
    deadline = time.time() + 2.0
    while len(started) < 3 and time.time() < deadline:
        time.sleep(0.01)
    assert first == 0
    assert len(started) >= 3, started
    assert list(it) == [1, 2, 3, 4]
    gate.set()


def test_worker_exception_propagates():
    def fn(x):
        if x == 3:
            raise ValueError("boom at 3")
        return x

    pf = Prefetcher(range(10), fn)
    seen = []
    with pytest.raises(ValueError, match="boom at 3"):
        for v in pf:
            seen.append(v)
    assert seen == [0, 1, 2]
