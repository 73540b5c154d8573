"""Batching loader with deterministic per-host sharding and bounded
background prefetch.

TPU-native replacement for torch DataLoader + DistributedSampler
(reference: train.py:421-439): each host deterministically owns an
interleaved slice of the epoch permutation (what DistributedSampler's
``rank::world`` striding does), workers are a thread pool instead of forked
processes (the heavy lifting is cv2/PIL which release the GIL), and batches
come out as NHWC numpy ready for ``jax.device_put`` onto a batch-sharded
mesh.

Readahead is bounded by ``prefetch`` batches: the producer blocks before
submitting more work, so host memory holds at most
``prefetch + 1`` decoded batches regardless of how far the consumer lags,
and abandoning the iterator early (e.g. fit's max_steps_per_epoch) only
waits for the in-flight batches, not the rest of the epoch.
"""
from __future__ import annotations

import concurrent.futures as cf
import threading
from queue import Queue
from typing import Iterator

import numpy as np


class Loader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 11, drop_last: bool = True,
                 process_index: int = 0, process_count: int = 1,
                 num_workers: int = 4, prefetch: int = 2):
        if batch_size % process_count:
            raise ValueError(
                f"global batch size {batch_size} must be divisible by the "
                f"process count {process_count}")
        self.dataset = dataset
        self.global_batch = batch_size
        self.local_batch = batch_size // process_count
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.process_index = process_index
        self.process_count = process_count
        # num_workers=0 means "no parallelism" (torch idiom): one thread
        # still drives the same pipeline synchronously enough
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.epoch = 0

    def set_epoch(self, epoch: int):
        """reference: train.py:495 (DistributedSampler.set_epoch)."""
        self.epoch = epoch

    def __len__(self):
        n = len(self.dataset) // self.global_batch
        if not self.drop_last and len(self.dataset) % self.global_batch:
            n += 1
        return n

    def _epoch_order(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.RandomState((self.seed + self.epoch) % (2**31))
            rng.shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[dict]:
        order = self._epoch_order()
        nb = len(self)
        epoch = self.epoch

        def load_one(i):
            return self.dataset.__getitem__(int(i), epoch=epoch)

        def shards():
            for b in range(nb):
                sl = order[b * self.global_batch:(b + 1) * self.global_batch]
                # per-host interleaved shard of the global batch
                yield sl[self.process_index::self.process_count]

        pool = cf.ThreadPoolExecutor(self.num_workers)
        pending: Queue = Queue(maxsize=self.prefetch)
        stop = object()
        abandoned = threading.Event()

        def submit_all():
            for sl in shards():
                if abandoned.is_set():
                    break
                futs = [pool.submit(load_one, i) for i in sl]
                # blocks when `prefetch` batches are already queued
                pending.put(futs)
                if abandoned.is_set():
                    break
            pending.put(stop)

        producer = threading.Thread(target=submit_all, daemon=True)
        producer.start()
        try:
            while True:
                futs = pending.get()
                if futs is stop:
                    break
                samples = [f.result() for f in futs]
                imgs = np.stack([s[0] for s in samples]).astype(np.uint8)
                lbls = np.stack([s[1] for s in samples]).astype(np.int32)
                yield {"image": imgs, "label": lbls}
        finally:
            abandoned.set()
            # unblock the producer if it is waiting on a full queue
            while not pending.empty():
                try:
                    pending.get_nowait()
                except Exception:
                    break
            producer.join(timeout=30)
            pool.shutdown(wait=False, cancel_futures=True)
