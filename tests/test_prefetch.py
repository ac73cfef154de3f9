"""DevicePrefetcher: order preservation, delivered-not-prefetched state
snapshots (the deterministic-resume contract), exception propagation at
the right position, stateless-iterator handling, and close()."""

import time

import numpy as np
import pytest

from mmbidaf_tpu.data.prefetch import DevicePrefetcher


class FakeStream:
    """Stateful iterator mimicking grain's get_state checkpointing."""

    def __init__(self, n=10, fail_at=None):
        self.i = 0
        self.n = n
        self.fail_at = fail_at

    def __iter__(self):
        return self

    def __next__(self):
        if self.fail_at is not None and self.i == self.fail_at:
            raise RuntimeError("boom")
        if self.i >= self.n:
            raise StopIteration
        self.i += 1
        return {"x": np.full((2,), self.i - 1)}

    def get_state(self):
        return str(self.i).encode()


def test_order_and_transform():
    pf = DevicePrefetcher(FakeStream(8), lambda nb: nb["x"] * 2, depth=3)
    out = list(pf)
    assert [int(nb["x"][0]) for nb, _ in out] == list(range(8))
    assert [int(d[0]) for _, d in out] == [2 * i for i in range(8)]


def test_state_tracks_delivered_not_prefetched():
    s = FakeStream(10)
    pf = DevicePrefetcher(s, lambda nb: nb, depth=3)
    try:
        assert pf.get_state() == b"0"  # nothing delivered yet
        deadline = time.time() + 10
        while s.i < 3 and time.time() < deadline:
            time.sleep(0.01)
        assert s.i >= 3  # the thread ran ahead of the consumer...
        assert pf.get_state() == b"0"  # ...but state reports DELIVERED pos
        next(pf)
        assert pf.get_state() == b"1"
        next(pf)
        next(pf)
        assert pf.get_state() == b"3"
    finally:
        pf.close()


def test_exception_propagates_after_good_batches():
    pf = DevicePrefetcher(FakeStream(10, fail_at=4), lambda nb: nb, depth=2)
    got = []
    with pytest.raises(RuntimeError, match="boom"):
        for nb, _ in pf:
            got.append(int(nb["x"][0]))
    assert got == [0, 1, 2, 3]  # every batch before the fault delivered


def test_stateless_stream_returns_none():
    pf = DevicePrefetcher(iter([{"x": np.zeros(1)}]), lambda nb: nb, depth=1)
    try:
        assert pf.get_state() is None
        next(pf)
        assert pf.get_state() is None
    finally:
        pf.close()


def test_close_mid_stream_stops_thread():
    pf = DevicePrefetcher(FakeStream(100_000), lambda nb: nb, depth=2)
    next(pf)
    pf.close()
    assert not pf._thread.is_alive()


def test_depth_validation():
    with pytest.raises(ValueError, match="depth"):
        DevicePrefetcher(FakeStream(1), lambda nb: nb, depth=0)


def test_exhaustion_is_sticky():
    """next() after StopIteration keeps raising StopIteration (a dead
    producer + empty queue must not deadlock the consumer)."""
    pf = DevicePrefetcher(FakeStream(2), lambda nb: nb, depth=2)
    assert len(list(pf)) == 2
    for _ in range(3):
        with pytest.raises(StopIteration):
            next(pf)


def test_error_then_stop_iteration():
    pf = DevicePrefetcher(FakeStream(5, fail_at=1), lambda nb: nb, depth=2)
    next(pf)
    with pytest.raises(RuntimeError, match="boom"):
        next(pf)
    with pytest.raises(StopIteration):  # error raised once, then exhausted
        next(pf)


def test_next_after_close_raises():
    pf = DevicePrefetcher(FakeStream(100), lambda nb: nb, depth=1)
    next(pf)
    assert pf.close() is True
    with pytest.raises(StopIteration):
        next(pf)
