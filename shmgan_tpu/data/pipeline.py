"""Host->device feed: background prefetch of sharded batches.

The reference's device boundary is iterator.get_next() per eager step
(ShmGANwithSSpecSeg.py:990). Here batches are pushed to device (with their mesh
sharding) on a background thread while the previous step computes, so the TPU never
waits on the host for the small SHMGAN batch sizes.

Multi-host: on a multi-process topology each process loads only its slice of the
global batch (PolarimetricDataset.iter_epoch(process_index=, process_count=))
and `put_global_batch` assembles the logically-global array from the
process-local shards via jax.make_array_from_process_local_data — no host ever
materializes or transfers the full global batch (SURVEY.md §2.2
'elastic/multi-node').
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax
import numpy as np

from shmgan_tpu.parallel.mesh import batch_sharding


def put_global_batch(batch: np.ndarray, mesh, spatial: bool = False):
    """Place one batch onto the mesh with its (V, B, H, W, 3) batch sharding.

    Single-process: `batch` is the global batch, placed with device_put.
    Multi-process: `batch` is this process's LOCAL slice (global B split evenly
    across processes, contiguous blocks in process order); the returned array is
    the logically-global jax.Array spanning all hosts.
    """
    sh = batch_sharding(mesh, ndim=batch.ndim, spatial=spatial)
    if jax.process_count() == 1:
        return jax.device_put(batch, sh)
    return jax.make_array_from_process_local_data(sh, batch)


class DevicePrefetcher:
    """Wraps a numpy-batch iterator; yields device-resident (sharded) arrays.

    On multi-host topologies the wrapped iterator must yield process-LOCAL
    batches (see put_global_batch / PolarimetricDataset.iter_epoch)."""

    _SENTINEL = object()

    def __init__(self, it: Iterator[np.ndarray], mesh=None, depth: int = 2,
                 spatial: bool = False):
        self._mesh = mesh
        self._q: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._err: Optional[BaseException] = None

        def put(batch):
            if self._mesh is not None:
                return put_global_batch(batch, self._mesh, spatial=spatial)
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
