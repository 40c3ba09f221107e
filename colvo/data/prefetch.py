"""Device prefetch (SURVEY.md component D5).

Double-buffered host→HBM pipeline: batches land on device ahead of the
step so the TPU never waits on the host (BASELINE.json north_star: "feed
the TPU at line rate"). With a sharding, each host transfers only its
addressable shards (per-host sharding for multi-chip, SURVEY.md D5).
"""

from __future__ import annotations

import collections
import threading
import queue
from typing import Any, Iterator, Optional

import jax


def prefetch_to_device(
    iterator: Iterator[Any],
    size: int = 2,
    sharding: Optional[jax.sharding.Sharding] = None,
) -> Iterator[Any]:
    """Wrap a host batch iterator with an N-deep on-device buffer.

    ``jax.device_put`` is async: it enqueues the transfer and returns
    immediately, so keeping ``size`` batches in flight overlaps H2D DMA
    with the running step. A background thread hides host-side batch
    assembly (decode/augment) as well.
    """

    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()

    def put(batch):
        if sharding is not None:
            batch = jax.tree.map(
                lambda x: jax.device_put(x, sharding if hasattr(x, "ndim") and x.ndim > 0 else None),
                batch,
            )
        else:
            batch = jax.tree.map(jax.device_put, batch)
        q.put(batch)

    def producer():
        try:
            for batch in iterator:
                put(batch)
        finally:
            q.put(_END)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()

    while True:
        batch = q.get()
        if batch is _END:
            return
        yield batch
