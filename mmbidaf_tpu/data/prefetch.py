"""Device prefetch for the training loop.

SURVEY §4.2 marks the reference's DataLoader worker processes as the
host/device boundary: host decode overlaps GPU compute. The TPU-native
equivalent overlaps host collate AND the H2D upload with the device step:
a background thread pulls host batches from the wrapped iterator, uploads
them (``to_device``, typically ``shard_batch`` → ``NamedSharding``
device_put), and hands ``(host_batch, device_batch)`` pairs to the
consumer through a bounded queue. With the loop's deferred metric fetch
(train.py), a step's H2D rides under the previous step's device compute
instead of extending the critical path.

Loader-state exactness (the deterministic-resume contract,
``tests/test_cli.py`` grain resume): ``get_state()`` must describe the
position after the last DELIVERED batch, not the last PREFETCHED one —
the thread runs up to ``depth`` batches ahead of the consumer. The thread
snapshots the inner iterator's state right after each ``next()`` and
attaches it to the item; ``get_state()`` replays the snapshot carried by
the most recently yielded batch (or the pre-thread initial snapshot).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator

_SENTINEL = object()


class DevicePrefetcher:
    """Wrap a host batch iterator with a prefetch-and-upload thread.

    Yields ``(host_batch, device_batch)`` where
    ``device_batch = to_device(host_batch)``. Iteration order is exactly
    the wrapped iterator's. Exceptions raised by the inner iterator or
    the upload surface in the consumer at the position they occurred.
    """

    def __init__(
        self,
        stream: Iterator,
        to_device: Callable,
        depth: int = 2,
    ):
        if depth < 1:
            raise ValueError(f"prefetch depth must be >= 1, got {depth}")
        self._stream = stream
        self._to_device = to_device
        self._has_state = hasattr(stream, "get_state")
        # snapshot BEFORE the thread advances the inner iterator: a
        # get_state() before any batch was consumed must describe the
        # starting position
        self._last_state = stream.get_state() if self._has_state else None
        self._error: BaseException | None = None
        self._closed = False
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._fill, name="mmbidaf-prefetch", daemon=True
        )
        self._thread.start()

    # -- producer thread ----------------------------------------------------

    def _fill(self) -> None:
        try:
            while not self._stop.is_set():
                try:
                    nb = next(self._stream)
                except StopIteration:
                    break
                state = self._stream.get_state() if self._has_state else None
                dev = self._to_device(nb)
                if not self._put((nb, dev, state)):
                    return  # closed while waiting for queue space
        except BaseException as e:  # noqa: BLE001 — surfaced in consumer
            self._error = e
        self._put(_SENTINEL)

    def _put(self, item) -> bool:
        """Bounded put that stays responsive to close()."""
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    # -- consumer side ------------------------------------------------------

    def __iter__(self):
        return self

    def __next__(self):
        if self._closed:
            raise StopIteration
        item = self._q.get()
        if item is _SENTINEL:
            # stay exhausted: re-queue the sentinel so repeated next()
            # raises StopIteration (iterator protocol) instead of
            # deadlocking on an empty queue with a dead producer
            self._q.put(_SENTINEL)
            if self._error is not None:
                err, self._error = self._error, None
                raise err
            raise StopIteration
        nb, dev, state = item
        self._last_state = state
        return nb, dev

    def get_state(self):
        """Inner-iterator state as of the last YIELDED batch, or ``None``
        when the wrapped iterator has no ``get_state`` (the caller's
        hasattr probe would otherwise see this method and assume grain)."""
        return self._last_state

    def close(self, timeout: float | None = None) -> bool:
        """Stop the thread and drop prefetched-but-undelivered batches.

        Blocks (by default) until the thread has actually exited: it may be
        mid-``to_device`` upload, and killing the process while a device op
        is in flight is the failure mode that wedges a tunnelled TPU claim
        (CLAUDE.md) — the wait is bounded by one batch's upload. Returns
        False if a ``timeout`` was given and expired with the thread still
        alive (caller decides whether exiting anyway is safe).
        """
        self._closed = True
        self._stop.set()
        # drain, then leave a sentinel so any consumer concurrently parked
        # in self._q.get() unblocks; the producer may sneak one last item
        # in before it notices the stop flag, so drain-and-retry
        while True:
            try:
                self._q.put_nowait(_SENTINEL)
                break
            except queue.Full:
                try:
                    self._q.get_nowait()
                except queue.Empty:
                    pass
        self._thread.join(timeout)
        return not self._thread.is_alive()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
