"""Input pipeline: shuffled, repeated, batched host arrays -> device batches.

TPU-native replacement for the reference tf.data pipeline
(NANN_impls/nann/data_provider/dataio.py:11-78): the dataset (packed numpy
arrays, memory-mapped for the real UserBehavior corpus) is shuffled per epoch,
batched with drop-remainder, and fed to the jitted train step. Device transfer
happens asynchronously inside jit dispatch; with a mesh the per-batch arrays
are laid out sharded over the "dp" axis by jax.device_put.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

try:  # optional at import time so pure-numpy tooling can reuse this module
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
except ImportError:  # pragma: no cover
    jax = None


class BatchIterator:
    """Epoch-shuffled batch iterator over a dict-of-arrays dataset."""

    def __init__(self, data: Dict[str, np.ndarray], batch_size: int,
                 epochs: int = 1, drop_remainder: bool = True, seed: int = 0,
                 mesh: Optional["Mesh"] = None, prefetch: int = 2):
        self.data = data
        self.batch_size = batch_size
        self.epochs = epochs
        self.drop_remainder = drop_remainder
        self.seed = seed
        self.prefetch = prefetch
        self.num_samples = len(next(iter(data.values())))
        self._shardings = None
        if mesh is not None:
            self._shardings = {
                k: NamedSharding(mesh, P("dp", *([None] * (v.ndim - 1))))
                for k, v in data.items()
            }

    def __len__(self) -> int:
        per_epoch = (self.num_samples // self.batch_size if self.drop_remainder
                     else -(-self.num_samples // self.batch_size))
        return per_epoch * self.epochs

    @property
    def batches_per_epoch(self) -> int:
        return (self.num_samples // self.batch_size if self.drop_remainder
                else -(-self.num_samples // self.batch_size))

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        return self.iter_from(0)

    def iter_from(self, start_batch: int) -> Iterator[Dict[str, np.ndarray]]:
        """Iterate from global batch `start_batch`, with `prefetch` batches
        materialized ahead on a background thread (host indexing + the
        device_put enqueue overlap the in-flight train step — the tf.data
        prefetch of the reference pipeline, dataio.py:66-71)."""
        if self.prefetch <= 0:
            yield from self._produce(start_batch)
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        _END, _ERR = object(), object()

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for b in self._produce(start_batch):
                    if not put(b):
                        return
                put(_END)
            except BaseException as e:  # propagate into the consumer
                put((_ERR, e))

        t = threading.Thread(target=worker, daemon=True,
                             name="batch-prefetch")
        t.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    return
                if (isinstance(item, tuple) and len(item) == 2
                        and item[0] is _ERR):
                    raise item[1]
                yield item
        finally:
            stop.set()  # consumer done/abandoned: let the worker exit

    def _produce(self, start_batch: int) -> Iterator[Dict[str, np.ndarray]]:
        """Resume fast-forward: skipped epochs cost nothing; the within-epoch
        offset just starts later in that epoch's permutation, so a resumed
        run sees exactly the batches the interrupted schedule still owed
        it."""
        per_epoch = self.batches_per_epoch
        first_epoch, offset = ((start_batch // per_epoch,
                                start_batch % per_epoch)
                               if per_epoch else (self.epochs, 0))
        for epoch in range(first_epoch, self.epochs):
            rng = np.random.default_rng(self.seed + epoch)
            order = rng.permutation(self.num_samples)
            end = (self.num_samples - self.num_samples % self.batch_size
                   if self.drop_remainder else self.num_samples)
            start0 = offset * self.batch_size if epoch == first_epoch else 0
            for start in range(start0, end, self.batch_size):
                idx = order[start:start + self.batch_size]
                batch = {k: v[idx] for k, v in self.data.items()}
                if self._shardings is not None:
                    batch = {k: jax.device_put(v, self._shardings[k])
                             for k, v in batch.items()}
                yield batch
