"""Host-side IO/compute overlap.

The reference processes scenes strictly serially (H5 read -> features -> ICP,
`registration_node.py` main loop). On TPU the host is idle while the device
runs the registration programs, so a one-thread lookahead on the *input* side
(H5 reads, image decode, numpy prep) hides most of the IO latency.

`prefetch(iterable, size)` wraps any iterator with a bounded background-thread
queue: items are produced ahead of consumption, exceptions re-raise at the
consumption point, and the thread shuts down cleanly when the consumer stops
early (generator close / GC).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


def prefetch(iterable: Iterable[T], size: int = 2) -> Iterator[T]:
    """Iterate `iterable` on a background thread, `size` items ahead."""
    if size < 1:
        raise ValueError(f"prefetch size must be >= 1, got {size}")
    q: "queue.Queue" = queue.Queue(maxsize=size)
    stop = threading.Event()

    def worker():
        def put_checked(obj) -> bool:
            # Every put must poll `stop`: a blocking put on a full queue after
            # the consumer left would strand this thread (and pin the queue +
            # iterable) for the life of the process.
            while not stop.is_set():
                try:
                    q.put(obj, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        try:
            for item in iterable:
                if not put_checked(item):
                    return
        except BaseException as e:  # re-raised at the consumer
            put_checked((_SENTINEL, e))
            return
        put_checked((_SENTINEL, None))

    t = threading.Thread(target=worker, daemon=True, name="vfmreg-prefetch")
    t.start()

    try:
        while True:
            item = q.get()
            if isinstance(item, tuple) and len(item) == 2 and item[0] is _SENTINEL:
                if item[1] is not None:
                    raise item[1]
                return
            yield item
    finally:
        stop.set()
