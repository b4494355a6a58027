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
import jax.numpy as jnp
import numpy as np


class Prefetcher:
    """Wrap a batch iterator with an N-deep background prefetch queue.

    :param batches: iterator of dict batches (numpy arrays + aux lists).
    :param to_device: optional fn(batch_dict) -> device batch (e.g.
        `lambda b: shard_batch(jnp_batch(b), mesh)`); runs on the prefetch
        thread so H2D transfer overlaps compute.
    :param depth: queue depth.

    Iteration past exhaustion keeps raising (StopIteration, or the pump's
    error) instead of blocking; `close()` unblocks and stops the pump so
    an abandoned iteration doesn't strand device-resident batches in HBM.
    Usable as a context manager.
    """

    _SENTINEL = object()

    def __init__(self, batches: Iterable, to_device: Optional[Callable] = None,
                 depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err: Optional[BaseException] = None
        self._to_device = to_device
        self._stop = threading.Event()
        self._done = False
        self._thread = threading.Thread(
            target=self._pump, args=(iter(batches),), daemon=True)
        self._thread.start()

    def _put(self, item) -> bool:
        """Blocking put that aborts when close() is called."""
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _pump(self, it: Iterator):
        try:
            for batch in it:
                if self._stop.is_set():
                    return
                if self._to_device is not None:
                    batch = self._to_device(batch)
                if not self._put(batch):
                    return
        except BaseException as e:          # surfaced on the consumer side
            self._err = e
        finally:
            self._put(self._SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        if self._done:
            if self._err is not None:
                raise self._err
            raise StopIteration
        item = self._q.get()
        if item is self._SENTINEL:
            self._done = True
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self):
        """Stop the pump thread and release queued (device) batches."""
        self._stop.set()
        self._done = True
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


@jax.jit
def _u8_to_unit(x):
    """uint8 pixels -> float32 [0,1] ON DEVICE: images ride the (tunnel)
    wire at 1/4 the bytes and the /255 reproduces the host float path to
    within 1 ulp (see data/fivek.py load_train_img)."""
    return x.astype(jnp.float32) / 255.0


def device_put_batch(batch: dict, sharding=None) -> dict:
    """numpy batch -> device arrays (aux string lists pass through).

    With a sharding, the host array is transferred straight to its shards
    (one H2D per shard) — never staged whole on the default device first.
    uint8 arrays (the datasets' wire_dtype=uint8 image format) are
    normalized to float32 [0,1] on device after the transfer, so step
    functions keep their float contract while the wire carries 8-bit.
    """
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            dv = (jax.device_put(v, sharding) if sharding is not None
                  else jnp.asarray(v))
            out[k] = _u8_to_unit(dv) if v.dtype == np.uint8 else dv
        else:
            out[k] = v
    return out
