"""Host→device prefetching: overlap HDF5 reads with TPU compute.

The reference moves each batch to the device synchronously inside the train
loop (reference: train_ocr.py:52-53 to_device per step).  Here a background
thread stages the next batches into HBM (optionally with an explicit
NamedSharding for multi-chip data parallelism) while the current step runs.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional

import jax


def prefetch_to_device(iterable: Iterable, size: int = 2,
                       sharding: Optional[jax.sharding.Sharding] = None) -> Iterator:
    """Yield items of `iterable` as device arrays, `size` batches ahead."""
    q: queue.Queue = queue.Queue(maxsize=size)
    sentinel = object()
    err: list[BaseException] = []

    def producer() -> None:
        try:
            for item in iterable:
                if sharding is not None:
                    item = jax.tree.map(lambda x: jax.device_put(x, sharding), item)
                else:
                    item = jax.tree.map(jax.device_put, item)
                q.put(item)
        except BaseException as e:  # propagate into consumer
            err.append(e)
        finally:
            q.put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item
