"""Host-side data loading: deterministic per-host sharded epoch ordering and a
threaded prefetch pipeline feeding sharded device batches.

The TPU-native replacement for torch DataLoader + DistributedSampler +
PrefetchLoader (reference utils/loader.py:11-73): each host reads only its
shard of the epoch permutation (seeded by epoch, like
``DistributedSampler.set_epoch``, reference train.py:458), worker threads run
the numpy sample pipeline, and finished batches are device_put against the
mesh's data sharding so the H2D copy overlaps the previous step.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, List, Optional

import jax
import numpy as np

from alignsdf_tpu.data.dataset import collate


def epoch_indices(num_items: int, epoch: int, num_shards: int, shard: int,
                  shuffle: bool = True, seed: int = 0) -> np.ndarray:
    """DistributedSampler-equivalent deterministic shard of a per-epoch
    permutation; pads to a multiple of num_shards like torch."""
    if shuffle:
        rng = np.random.default_rng(seed + epoch)
        order = rng.permutation(num_items)
    else:
        order = np.arange(num_items)
    total = -(-num_items // num_shards) * num_shards
    if total > num_items:
        order = np.concatenate([order, order[: total - num_items]])
    return order[shard::num_shards]


class DataLoader:
    """Threaded map-style loader with prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        num_workers: int = 4,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        num_shards: int = 1,
        shard: int = 0,
        to_batch: Optional[Callable] = None,
        sharding=None,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_shards = num_shards
        self.shard = shard
        self.to_batch = to_batch
        self.sharding = sharding
        self.prefetch = prefetch
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset) // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _batches(self) -> Iterator[List[int]]:
        idx = epoch_indices(len(self.dataset), self._epoch, self.num_shards,
                            self.shard, self.shuffle, self.seed)
        n = len(idx)
        stop = n - n % self.batch_size if self.drop_last else n
        for i in range(0, stop, self.batch_size):
            yield list(idx[i:i + self.batch_size])

    def __iter__(self):
        batch_queue: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        batches = list(self._batches())

        def worker():
            try:
                for batch_idx in batches:
                    items = [self.dataset[i] for i in batch_idx]
                    stacked = collate(items)
                    if self.to_batch is not None:
                        stacked = self.to_batch(stacked)
                    if self.sharding is not None:
                        stacked = {
                            k: (jax.device_put(v, self.sharding[k])
                                if isinstance(v, np.ndarray) and k in self.sharding
                                else v)
                            for k, v in stacked.items()
                        }
                    batch_queue.put(stacked)
            finally:
                batch_queue.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = batch_queue.get()
            if item is None:
                break
            yield item
