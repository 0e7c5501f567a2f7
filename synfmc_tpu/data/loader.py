"""Host-side data loading: threaded prefetch + per-process sharding.

Replaces the reference's torch DataLoader(num_workers=8) + DistributedSampler
(train_cam_ctrl.py:334-366): each JAX process owns a round-robin shard of the
dataset (keyed on jax.process_index()), worker threads run the numpy/PIL
__getitem__ pipeline, and batches are prefetched ahead of device compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import numpy as np


class ShardedLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        collate_fn: Callable,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 4,
        prefetch: int = 2,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
        drop_last: bool = True,
    ):
        import jax

        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.process_index = jax.process_index() if process_index is None else process_index
        self.process_count = jax.process_count() if process_count is None else process_count
        self.drop_last = drop_last
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Per-epoch reshuffle (DistributedSampler.set_epoch parity,
        train_cam_ctrl.py:504-505)."""
        self.epoch = epoch

    def _epoch_indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        return idx[self.process_index :: self.process_count]

    def __len__(self) -> int:
        n = len(self._epoch_indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        indices = self._epoch_indices()
        batches = [
            indices[i : i + self.batch_size]
            for i in range(0, len(indices) - (self.batch_size - 1 if self.drop_last else 0), self.batch_size)
        ]
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        job_q: queue.Queue = queue.Queue()
        results: dict[int, dict] = {}
        lock = threading.Lock()

        for bi, batch_idx in enumerate(batches):
            job_q.put((bi, batch_idx))
        stop = object()

        def worker():
            while True:
                try:
                    bi, batch_idx = job_q.get_nowait()
                except queue.Empty:
                    return
                samples = [self.dataset[int(i)] for i in batch_idx]
                with lock:
                    results[bi] = self.collate_fn(samples)

        threads = [threading.Thread(target=worker, daemon=True) for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        for bi in range(len(batches)):
            while True:
                with lock:
                    if bi in results:
                        batch = results.pop(bi)
                        break
                threading.Event().wait(0.002)
            yield batch
