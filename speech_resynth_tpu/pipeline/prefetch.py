"""Background batch prefetch: overlap host-side batch materialization
(file reads, crops, pad-collation, device transfer) with device compute.

The reference gets this from torch DataLoader workers
(num_workers, e.g. hifigan/train.py DataLoader); here a single daemon
thread runs the batch iterator + device placement ahead of the training
loop — enough on this host model because the C++ readers
(dsp/csrc/wavio.cpp) already fan out file IO across threads inside one
batch, and jax dispatch is async.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional, TypeVar

T = TypeVar("T")
U = TypeVar("U")

_SENTINEL = object()


def prefetch(
    iterable: Iterable[T],
    transform: Optional[Callable[[T], U]] = None,
    depth: int = 2,
) -> Iterator[U]:
    """Yield ``transform(item)`` for each item, computed ``depth`` items
    ahead on a daemon thread.  Exceptions from the iterator or transform
    re-raise at the consumption site; order is preserved."""
    q: queue.Queue = queue.Queue(maxsize=max(depth, 1))
    stop = threading.Event()

    def _put(payload) -> bool:
        # bounded put that gives up when the consumer is gone — otherwise an
        # abandoned generator (early break) leaves the worker blocked forever
        # holding prefetched (device) batches
        while not stop.is_set():
            try:
                q.put(payload, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterable:
                if not _put((None, transform(item) if transform is not None else item)):
                    return
        except BaseException as e:  # noqa: BLE001 — propagate to consumer
            _put((e, None))
        else:
            _put((None, _SENTINEL))

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            err, item = q.get()
            if err is not None:
                raise err
            if item is _SENTINEL:
                return
            yield item
    finally:
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
