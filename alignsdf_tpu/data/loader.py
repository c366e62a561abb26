"""Host-side data loading: deterministic per-host sharded epoch ordering and a
multi-threaded prefetch pipeline feeding sharded device batches.

The TPU-native replacement for torch DataLoader + DistributedSampler +
PrefetchLoader (reference utils/loader.py:11-73): each host reads only its
shard of the epoch permutation (seeded by epoch, like
``DistributedSampler.set_epoch``, reference train.py:458), ``num_workers``
threads run the numpy/cv2/native sample pipeline concurrently (the hot ops —
jpg decode, warpAffine, zlib, the ctypes packed reader — all release the GIL),
and finished batches are device_put against the mesh's data sharding so the
H2D copy overlaps the previous step.

Unlike the reference's per-process torch workers, augmentation randomness is
deterministic: every sample draw is seeded by (loader seed, epoch, global
sample position), so a run is bit-reproducible for any worker count.
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


def _mp_worker(loader: "DataLoader", task_q, result_q, epoch: int) -> None:
    """Forked worker: builds batches (no device_put — JAX stays untouched in
    children; the parent shards/uploads on yield)."""
    try:
        import cv2

        cv2.setNumThreads(0)  # no OpenMP pool in forked children
    except ImportError:
        pass
    while True:
        job = task_q.get()
        if job is None:
            return
        bi, batch_idx = job
        try:
            out = loader._build_batch(batch_idx, epoch, bi * loader.batch_size,
                                      device_put=False)
            result_q.put((bi, out, None))
        except BaseException as e:  # surfaced in the parent
            result_q.put((bi, None, e))


class DataLoader:
    """Multi-worker map-style loader with ordered prefetch.

    ``worker_mode='thread'`` shares the process (fine for native/GIL-releasing
    pipelines); ``'process'`` forks ``num_workers`` children per epoch — the
    equivalent of torch DataLoader workers — and is what the train CLI uses
    to feed the measured device rate."""

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
        seeded: bool = True,
        worker_mode: str = "thread",
        native_batches: bool = True,
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
        self.prefetch = max(1, prefetch)
        if worker_mode not in ("thread", "process"):
            raise ValueError(f"worker_mode {worker_mode!r}")
        self.worker_mode = worker_mode
        # whole-batch native pipeline (PackedSDFDataset.build_batch): emits
        # the standard to_train_batch layout, so only usable when the caller
        # wants that layout (to_batch is treated as already applied)
        self.native_batches = native_batches and callable(
            getattr(dataset, "build_batch", None))
        import inspect

        try:
            takes_seed = "seed" in inspect.signature(
                dataset.__getitem__).parameters
        except (TypeError, ValueError):
            takes_seed = False
        self.seeded = seeded and takes_seed
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

    def _sample_seed(self, epoch: int, position: int) -> Optional[int]:
        """Seed for the sample at global (sharded) position ``position`` of
        ``epoch`` — stable across worker counts and restarts."""
        if not self.seeded:
            return None
        mix = (self.seed * 1_000_003 + epoch) * 0x9E3779B1 + position
        return mix & 0x7FFFFFFF

    def _build_batch(self, batch_idx: List[int], epoch: int, base_pos: int,
                     device_put: bool = True):
        if self.native_batches:
            seeds = [self._sample_seed(epoch, base_pos + j)
                     for j in range(len(batch_idx))]
            out = self.dataset.build_batch(batch_idx, seeds)
            if out is not None:
                return self._device_put(out) if device_put else out
        items = []
        for j, i in enumerate(batch_idx):
            seed = self._sample_seed(epoch, base_pos + j)
            if seed is None:
                items.append(self.dataset[i])
            else:
                items.append(self.dataset.__getitem__(i, seed=seed))
        stacked = collate(items)
        if self.to_batch is not None:
            stacked = self.to_batch(stacked)
        if device_put:
            stacked = self._device_put(stacked)
        return stacked

    def _device_put(self, stacked):
        if self.sharding is None:
            return stacked
        multiprocess = jax.process_count() > 1
        out = {}
        for k, v in stacked.items():
            if not (isinstance(v, np.ndarray) and k in self.sharding):
                out[k] = v
            elif multiprocess:
                # each host loaded only its shard: assemble the global array
                # (reference DistributedSampler semantics — the jitted step
                # sees the global batch, GSPMD keeps shards device-local)
                global_shape = (v.shape[0] * jax.process_count(),) + v.shape[1:]
                out[k] = jax.make_array_from_process_local_data(
                    self.sharding[k], v, global_shape=global_shape)
            else:
                out[k] = jax.device_put(v, self.sharding[k])
        return out

    def __iter__(self):
        batches = list(self._batches())
        epoch = self._epoch
        n_batches = len(batches)
        if n_batches == 0:
            return
        if self.worker_mode == "process" and self.num_workers > 1:
            yield from self._iter_processes(batches, epoch)
            return

        # Bounded-window ordered pipeline: up to (num_workers + prefetch)
        # batches in flight; results delivered strictly in epoch order.
        task_q: "queue.Queue" = queue.Queue()
        results: Dict[int, object] = {}
        lock = threading.Condition()
        stop_flag = threading.Event()
        window = self.num_workers + self.prefetch

        def worker():
            while not stop_flag.is_set():
                try:
                    job = task_q.get(timeout=0.1)
                except queue.Empty:
                    continue
                if job is None:
                    return
                bi, batch_idx = job
                try:
                    out = self._build_batch(batch_idx, epoch,
                                            bi * self.batch_size)
                except BaseException as e:  # surfaced to the consumer
                    out = e
                with lock:
                    results[bi] = out
                    lock.notify_all()

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        submitted = 0
        try:
            while submitted < min(window, n_batches):
                task_q.put((submitted, batches[submitted]))
                submitted += 1
            for bi in range(n_batches):
                with lock:
                    while bi not in results:
                        lock.wait()
                    out = results.pop(bi)
                if isinstance(out, BaseException):
                    raise out
                if submitted < n_batches:
                    task_q.put((submitted, batches[submitted]))
                    submitted += 1
                yield out
        finally:
            stop_flag.set()
            for _ in threads:
                task_q.put(None)
            for t in threads:
                t.join(timeout=5)

    def _iter_processes(self, batches: List[List[int]], epoch: int):
        """Forked worker pool (one pool per epoch); ordered delivery with a
        bounded in-flight window, device_put in the parent."""
        import multiprocessing as mp

        ctx = mp.get_context("fork")
        task_q = ctx.Queue()
        result_q = ctx.Queue()
        procs = [
            ctx.Process(target=_mp_worker, args=(self, task_q, result_q, epoch),
                        daemon=True)
            for _ in range(self.num_workers)
        ]
        for p in procs:
            p.start()

        n_batches = len(batches)
        window = self.num_workers + self.prefetch
        results: Dict[int, object] = {}
        submitted = 0
        try:
            while submitted < min(window, n_batches):
                task_q.put((submitted, batches[submitted]))
                submitted += 1
            for bi in range(n_batches):
                while bi not in results:
                    got_bi, out, err = result_q.get()
                    results[got_bi] = err if err is not None else out
                out = results.pop(bi)
                if isinstance(out, BaseException):
                    raise out
                if submitted < n_batches:
                    task_q.put((submitted, batches[submitted]))
                    submitted += 1
                yield self._device_put(out)
        finally:
            for _ in procs:
                task_q.put(None)
            for p in procs:
                p.join(timeout=5)
                if p.is_alive():
                    p.terminate()
