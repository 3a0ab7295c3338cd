"""Threaded host-side batch loader.

Replaces the reference's torch DataLoader worker processes
(/root/reference/src/main.py:100-107) with a thread pool + prefetch queue:
decode/augment on host threads (PIL/numpy release the GIL for the heavy
parts), assemble NHWC numpy batches, and hand them to the trainer which
places them on the device mesh.

Determinism: the shuffle order is a seeded permutation of the epoch; each
sample gets an independent `np.random.Generator` seeded by
(seed, epoch, global index) — stable under resume and under multi-host
sharding (the reference's DistributedSampler + set_epoch equivalent,
main.py:93-96,185).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np


def _collate(samples) -> Dict[str, np.ndarray]:
    return {
        k: np.stack([s[k] for s in samples], axis=0).astype(np.float32)
        for k in samples[0]
    }


class DataLoader:
    """Iterates deterministic, sharded, prefetched batches for one epoch.

    batch_size is the PER-SHARD batch; with `num_shards` hosts each host
    iterates its own disjoint slice of the epoch permutation.
    """

    def __init__(self, dataset, batch_size: int, *, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0,
                 num_threads: int = 4, shard_index: int = 0,
                 num_shards: int = 1, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_threads = max(1, num_threads)
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            order = np.random.default_rng(
                (self.seed * 100_003 + self.epoch)).permutation(n)
        # pad so every shard sees the same number of samples (reference
        # DistributedSampler semantics), then take our strided shard.
        if self.num_shards > 1:
            pad = (-len(order)) % self.num_shards
            if pad:
                order = np.concatenate([order, order[:pad]])
            order = order[self.shard_index::self.num_shards]
        return order

    def __len__(self):
        n = len(self._epoch_indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._epoch_indices()
        nb = len(self)
        if nb == 0:
            return

        def load_one(pos: int):
            idx = int(order[pos])
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, self.epoch, idx]))
            if _takes_rng(self.dataset):
                return self.dataset.__getitem__(idx, rng)
            return self.dataset[idx]

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            # Bounded put that never parks forever: if the consumer exited
            # mid-epoch (stop set), give up instead of blocking — otherwise
            # an abandoned iterator leaks its thread pool until process
            # exit.
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            with ThreadPoolExecutor(self.num_threads) as pool:
                for b in range(nb):
                    if stop.is_set():
                        return
                    lo = b * self.batch_size
                    hi = min(lo + self.batch_size, len(order))
                    samples = list(pool.map(load_one, range(lo, hi)))
                    if not put_or_stop(_collate(samples)):
                        return
            put_or_stop(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()
            # unblock a producer parked in put, then wait for it to exit
            while t.is_alive():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    pass
                t.join(timeout=0.05)


def _takes_rng(dataset) -> bool:
    # BaseDataset subclasses take (idx, rng); plain sequences don't.
    from nlspn_eccv20_tpu.data import BaseDataset

    return isinstance(dataset, BaseDataset)
