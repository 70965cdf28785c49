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
import numpy as np


def prefetch_to_device(iterable: Iterable, size: int = 2,
                       sharding: Optional[jax.sharding.Sharding] = None,
                       superbatch: int = 1, yield_whole: bool = False) -> Iterator:
    """Yield items of `iterable` as device arrays, `size` batches ahead.

    ``superbatch > 1`` amortises host->device transfer latency: that many
    consecutive batches are stacked on the host, staged into HBM with ONE
    ``device_put``, and yielded back as on-device slices.  On a
    latency-dominated transport (one RPC per transfer) this cuts the per-batch
    upload cost by ~superbatch x; slicing on device is a cheap async dispatch.
    Only equal-shaped batches are grouped — a trailing partial group is
    uploaded as-is.  Not combined with ``sharding`` (slicing a batch-sharded
    array would reshard); callers pass one or the other.

    ``yield_whole=True`` yields each staged superbatch as ONE dict with k*B
    leading rows instead of slicing it back into batches — the shape consumed
    by ``OCR.update_many`` (k scanned optimizer steps per dispatch).
    """
    if superbatch > 1 and sharding is not None:
        raise ValueError("superbatch and sharding are mutually exclusive")
    q: queue.Queue = queue.Queue(maxsize=size)
    sentinel = object()
    err: list[BaseException] = []

    def put(item) -> None:
        if sharding is not None:
            item = jax.tree.map(lambda x: jax.device_put(x, sharding), item)
        else:
            item = jax.tree.map(jax.device_put, item)
        q.put(item)

    def put_group(group: list) -> None:
        if len(group) == 1 and not yield_whole:
            put(group[0])
            return
        stacked = {k: np.concatenate([g[k] for g in group]) for k in group[0]} \
            if len(group) > 1 else group[0]
        dev = jax.tree.map(jax.device_put, stacked)
        if yield_whole:
            q.put(dev)
            return
        n = len(group)
        for i in range(n):
            q.put({k: v[i * (v.shape[0] // n):(i + 1) * (v.shape[0] // n)]
                   for k, v in dev.items()})

    def producer() -> None:
        try:
            group: list = []
            for item in iterable:
                if superbatch <= 1:
                    put(item)
                    continue
                if group and (item.keys() != group[0].keys()
                              or any(item[k].shape != group[0][k].shape
                                     for k in group[0])):
                    put_group(group)
                    group = []
                group.append(item)
                if len(group) == superbatch:
                    put_group(group)
                    group = []
            if group:
                put_group(group)
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
