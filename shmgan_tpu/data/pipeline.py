"""Host->device feed: background prefetch of sharded batches.

The reference's device boundary is iterator.get_next() per eager step
(ShmGANwithSSpecSeg.py:990). Here batches are pushed to device (with their mesh
sharding) on a background thread while the previous step computes, so the TPU never
waits on the host for the small SHMGAN batch sizes.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax
import numpy as np

from shmgan_tpu.parallel.mesh import batch_sharding


class DevicePrefetcher:
    """Wraps a numpy-batch iterator; yields device-resident (sharded) arrays."""

    _SENTINEL = object()

    def __init__(self, it: Iterator[np.ndarray], mesh=None, depth: int = 2,
                 spatial: bool = False):
        self._mesh = mesh
        self._q: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._err: Optional[BaseException] = None

        def put(batch):
            if self._mesh is not None:
                sh = batch_sharding(self._mesh, ndim=batch.ndim, spatial=spatial)
                return jax.device_put(batch, sh)
            return jax.device_put(batch)

        def worker():
            try:
                for batch in it:
                    self._q.put(put(batch))
            except BaseException as e:  # propagate into the consumer
                self._err = e
            finally:
                self._q.put(self._SENTINEL)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
