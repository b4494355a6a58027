"""Background-prefetching batch loader.

The reference overlaps host data prep with GPU compute via DataLoader
worker processes (reference train_seq2seqL1.py:155). Here a thread pumps
collated numpy batches through a bounded queue and (optionally) stages
them onto device / a sharded mesh layout ahead of use, so the TPU never
waits on JPEG decode + resize.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

import jax
import numpy as np


class Prefetcher:
    """Wrap a batch iterator with an N-deep background prefetch queue.

    :param batches: iterator of dict batches (numpy arrays + aux lists).
    :param to_device: optional fn(batch_dict) -> device batch (e.g.
        `lambda b: shard_batch(jnp_batch(b), mesh)`); runs on the prefetch
        thread so H2D transfer overlaps compute.
    :param depth: queue depth.
    """

    _SENTINEL = object()

    def __init__(self, batches: Iterable, to_device: Optional[Callable] = None,
                 depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err: Optional[BaseException] = None
        self._to_device = to_device
        self._thread = threading.Thread(
            target=self._pump, args=(iter(batches),), daemon=True)
        self._thread.start()

    def _pump(self, it: Iterator):
        try:
            for batch in it:
                if self._to_device is not None:
                    batch = self._to_device(batch)
                self._q.put(batch)
        except BaseException as e:          # surfaced on the consumer side
            self._err = e
        finally:
            self._q.put(self._SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def device_put_batch(batch: dict, sharding=None) -> dict:
    """numpy batch -> device arrays (aux string lists pass through)."""
    import jax.numpy as jnp

    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            arr = jnp.asarray(v)
            if sharding is not None:
                arr = jax.device_put(arr, sharding)
            out[k] = arr
        else:
            out[k] = v
    return out
