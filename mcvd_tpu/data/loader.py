"""Batch loader: shuffled epoch iteration, per-host sharding, device prefetch.

TPU-native replacement for the reference's torch DataLoader
(ncsn_runner.py:251-259): numpy batches are assembled on host, sharded over
the data mesh axis with jax.device_put, and prefetched one step ahead so host
synthesis overlaps device compute.
"""

from __future__ import annotations

import threading
import queue as queue_mod
from typing import Iterator

import jax
import numpy as np


class DataLoader:
    """Map-style dataset -> shuffled numpy batches (drop_last=False)."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True, seed: int = 0,
                 drop_last: bool = False, num_processes: int = 1, process_index: int = 0,
                 repeat: bool = False, num_workers: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_processes = num_processes
        self.process_index = process_index
        self.repeat = repeat
        self.num_workers = num_workers
        per_host = len(dataset) // max(1, num_processes)
        if drop_last and per_host < batch_size:
            # with drop_last the epoch would yield ZERO batches; with
            # repeat=True that is an infinite busy loop — fail fast instead
            raise ValueError(
                f"batch_size={batch_size} exceeds the per-host split size "
                f"{per_host} with drop_last=True (dataset {len(dataset)} / "
                f"{num_processes} processes) — no batch would ever be yielded")
        self._pool = None
        if num_workers > 0:
            # thread pool (not processes): h5py/np decode releases the GIL,
            # and threads share the dataset's open shard handles
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=num_workers)
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset) // self.num_processes
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(np.random.SeedSequence([self.seed, self._epoch]))
            rng.shuffle(idx)
        # per-host shard (reference has no multi-host; this is the
        # jax.process_index() analog of per-worker sharding)
        return idx[self.process_index :: self.num_processes]

    def __iter__(self) -> Iterator:
        while True:
            if hasattr(self.dataset, "set_epoch"):
                self.dataset.set_epoch(self._epoch)
            idx = self._epoch_indices()
            for i in range(0, len(idx), self.batch_size):
                chunk = idx[i : i + self.batch_size]
                if self.drop_last and len(chunk) < self.batch_size:
                    break
                if hasattr(self.dataset, "get_batch"):
                    yield self.dataset.get_batch(chunk)
                    continue
                if self._pool is not None:
                    items = list(self._pool.map(
                        lambda j: self.dataset[int(j)], chunk))
                else:
                    items = [self.dataset[int(j)] for j in chunk]
                if isinstance(items[0], tuple):
                    xs = np.stack([it[0] for it in items])
                    ys = np.asarray([it[1] for it in items])
                    yield xs, ys
                else:
                    yield np.stack(items), None
            self._epoch += 1
            if not self.repeat:
                return


def prefetch_to_device(iterator, size: int = 2, sharding=None,
                       wire_dtype=None):
    """Overlap host batch assembly with device compute.

    The producer thread only assembles numpy batches; device placement stays
    on the consumer thread (device_put from a background thread deadlocks
    against main-thread dispatch on the axon TPU backend — re-confirmed).
    With a sharding, the batch is placed directly into the sharded layout.

    With sharding=None the consumer gets raw numpy: pass that straight into
    the jitted step — jit's implicit host transfer is async and pipelines
    with device compute (55ms/step vs 81ms blocking device_put for a 5.2MB
    f32 batch), where an explicit device_put serializes. `wire_dtype`
    (e.g. np.float16) casts on the producer thread to halve tunnel bytes.
    """
    q: queue_mod.Queue = queue_mod.Queue(maxsize=size)
    sentinel = object()

    def _wire_cast(x):
        if not (isinstance(x, np.ndarray) and x.dtype == np.float32):
            return x
        if wire_dtype == np.uint8:
            # lossless for uint8-sourced video (k/255 f32 values round-trip
            # exactly); 4x fewer tunnel bytes. Device side divides by 255.
            return np.clip(np.rint(x * 255.0), 0, 255).astype(np.uint8)
        return x.astype(wire_dtype)

    def producer():
        try:
            for item in iterator:
                if wire_dtype is not None:
                    item = jax.tree_util.tree_map(
                        _wire_cast, item,
                        is_leaf=lambda x: x is None or isinstance(x, np.ndarray),
                    )
                q.put(item)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        if sharding is not None:
            item = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding) if x is not None else None,
                item,
                is_leaf=lambda x: x is None or isinstance(x, np.ndarray),
            )
        yield item
