"""Threaded batch loader + double-buffered device prefetch.

The TPU-native replacement for torch DataLoader worker processes
(train.py:228-233): a thread pool decodes/augments samples (cv2/numpy
release the GIL), batches are collated to pinned numpy, and
device_prefetch keeps N batches in flight on device so the jitted train
step never waits on the host (SURVEY.md §2.8 host-side parallelism).
"""
from __future__ import annotations

import collections
import concurrent.futures as cf
import random
from typing import Iterator

import numpy as np


def collate(samples: list[dict]) -> dict:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 4, drop_last: bool = True,
                 seed: int | None = None, batch_slice: slice | None = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        # Multi-host: every process iterates the SAME shuffled index
        # sequence (seeded) batched at the GLOBAL batch size, but loads
        # only its own rows of each batch (parallel/distributed.py
        # process_batch_slice). None = load the full batch (single host).
        self.batch_slice = batch_slice
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        indices = list(range(len(self.dataset)))
        if self.shuffle:
            rng = random.Random(
                None if self.seed is None else self.seed + self._epoch)
            rng.shuffle(indices)
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(self._epoch)
        self._epoch += 1

        n_batches = len(self)
        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            # pipeline 2 batches ahead
            pending = collections.deque()

            def submit(b):
                idxs = indices[b * self.batch_size:(b + 1) * self.batch_size]
                if self.batch_slice is not None:
                    idxs = idxs[self.batch_slice]
                pending.append(pool.map(self.dataset.__getitem__, idxs))

            ahead = min(2, n_batches)
            for b in range(ahead):
                submit(b)
            for b in range(n_batches):
                if b + ahead < n_batches:
                    submit(b + ahead)
                yield collate(list(pending.popleft()))


def device_prefetch(iterator, mesh=None, size: int = 2):
    """Move batches to device ahead of consumption (double buffering).
    With a mesh, batches land sharded on the batch axis."""
    import jax

    if mesh is not None:
        # shard_batch handles both single-process device_put and the
        # multi-host local-rows -> global-array assembly
        from cc_tpu.parallel.mesh import shard_batch
        put = lambda b: shard_batch(b, mesh)
    else:
        put = lambda b: jax.tree_util.tree_map(jax.device_put, b)

    buf = collections.deque()
    for batch in iterator:
        buf.append(put(batch))
        if len(buf) >= size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
