"""Samplers + loader: infinite seeded stream, mosaic-flag batches, prefetch.

Parity targets:
  - InfiniteSampler (seeded shuffled stream, rank-strided)
        ref yolox/data/samplers.py:14-85
  - YoloBatchSampler ((mosaic_flag, idx) tuples) ref samplers.py:25-27
  - DataLoader.close_mosaic / worker seeding  ref yolox/data/dataloading.py:42-114
  - DataPrefetcher (H2D overlap)               ref yolox/data/data_prefetcher.py:8-51

TPU re-design: instead of torch DataLoader worker processes + CUDA-stream
prefetch, a thread pool assembles fixed-shape numpy batches and a
double-buffered ``device_put`` overlaps host->device transfer with compute
(jax dispatch is async; keeping one batch in flight is the TPU analogue of
the reference's side-stream copy).
"""

from __future__ import annotations

import itertools
import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np


class InfiniteSampler:
    """Seeded infinite shuffled index stream, strided by (rank, world)."""

    def __init__(self, size: int, shuffle: bool = True, seed: int = 0,
                 rank: int = 0, world_size: int = 1):
        assert size > 0
        self.size = size
        self.shuffle = shuffle
        self.seed = seed
        self.rank = rank
        self.world_size = world_size

    def __iter__(self) -> Iterator[int]:
        yield from itertools.islice(
            self._infinite(), self.rank, None, self.world_size)

    def _infinite(self):
        g = np.random.default_rng(self.seed)
        while True:
            if self.shuffle:
                yield from g.permutation(self.size).tolist()
            else:
                yield from range(self.size)


class YoloBatchSampler:
    """Batches of (mosaic_flag, idx) tuples (ref samplers.py:14-27)."""

    def __init__(self, sampler: InfiniteSampler, batch_size: int,
                 mosaic: bool = True):
        self.sampler = sampler
        self.batch_size = batch_size
        self.mosaic = mosaic

    def __iter__(self):
        batch = []
        for idx in self.sampler:
            batch.append((self.mosaic, idx))
            if len(batch) == self.batch_size:
                yield batch
                batch = []


# fork-shared dataset slot for process workers: set by DetectionLoader
# BEFORE the ProcessPoolExecutor forks, read by _process_fetch in the child.
# No pickling of the (possibly image-caching) dataset happens this way.
_FORK_DATASET = None


def _process_fetch(item, rng_seed):
    rng = random.Random(rng_seed)
    ds = _FORK_DATASET
    if hasattr(ds, "fetch"):
        return ds.fetch(item, rng)
    return ds[item]


class DetectionLoader:
    """Batch assembler over a map-style dataset with thread or process
    workers (ref yolox/data/dataloading.py torch DataLoader workers).

    Yields (images (B,H,W,3) float32, labels (B,G,5) float32, infos, ids).
    ``close_mosaic()`` mirrors ref dataloading.py: flips the sampler flag and
    the dataset's own switch.

    Every item is fetched with its own ``random.Random`` seeded from
    (loader seed, stream position), so the augmentation stream is
    deterministic regardless of worker count, executor type, or scheduling.
    mode="process" forks worker processes (mosaic + affine are cv2/numpy
    heavy; threads serialize on the GIL for the numpy parts).
    """

    def __init__(self, dataset, batch_sampler: YoloBatchSampler,
                 num_workers: int = 2, seed: int = 0, prefetch: int = 2,
                 mode: str = "thread", collate_fn=None):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.num_workers = max(num_workers, 1)
        self.seed = seed
        self.prefetch = prefetch
        self.mode = mode
        self.collate_fn = collate_fn  # items -> (imgs, labels, infos, ids)
        self._counter = 0

    def close_mosaic(self):
        self.batch_sampler.mosaic = False
        if hasattr(self.dataset, "close_mosaic"):
            self.dataset.close_mosaic()
        # process workers hold a forked copy of the dataset: restart them so
        # the flag flip is visible (thread workers share the object)
        self._restart_pool = True

    def _item_seed(self, counter: int) -> int:
        return (self.seed + 1) * 1_000_003 + counter

    def _fetch(self, item, counter):
        rng = random.Random(self._item_seed(counter))
        if hasattr(self.dataset, "fetch"):
            return self.dataset.fetch(item, rng)
        return self.dataset[item]

    def _make_pool(self):
        if self.mode == "process":
            import multiprocessing as mp
            from concurrent.futures import ProcessPoolExecutor

            global _FORK_DATASET
            _FORK_DATASET = self.dataset
            return ProcessPoolExecutor(
                max_workers=self.num_workers,
                mp_context=mp.get_context("fork"))
        return ThreadPoolExecutor(max_workers=self.num_workers)

    def _submit(self, pool, item, counter):
        if self.mode == "process":
            return pool.submit(_process_fetch, item,
                               self._item_seed(counter))
        return pool.submit(self._fetch, item, counter)

    def __iter__(self):
        self._restart_pool = False
        pool = self._make_pool()
        batches = iter(self.batch_sampler)
        pending = queue.Queue()

        def submit_next():
            nonlocal pool
            if self._restart_pool:
                pool.shutdown(wait=False, cancel_futures=False)
                pool = self._make_pool()
                self._restart_pool = False
            try:
                batch = next(batches)
            except StopIteration:
                return False
            futs = []
            for it in batch:
                futs.append(self._submit(pool, it, self._counter))
                self._counter += 1
            pending.put(futs)
            return True

        for _ in range(self.prefetch):
            submit_next()
        try:
            while True:
                futures = pending.get()
                submit_next()
                items = [f.result() for f in futures]
                if self.collate_fn is not None:
                    yield self.collate_fn(items)
                    continue
                imgs = np.stack([np.asarray(it[0], np.float32) for it in items])
                labels = np.stack([np.asarray(it[1], np.float32) for it in items])
                infos = [it[2] for it in items]
                ids = [it[3] for it in items]
                yield imgs, labels, infos, ids
        finally:
            pool.shutdown(wait=False, cancel_futures=True)


class DevicePrefetcher:
    """Double-buffered host->device staging (ref data_prefetcher.py:8-51).

    Keeps one batch already transferred while the current one computes; with
    jax async dispatch this fully overlaps H2D with TPU compute.
    """

    def __init__(self, loader, device=None, sharding=None):
        """``sharding`` may be a Sharding or a callable ``array ->
        Sharding`` (mixed-rank batches on a 2-D mesh: images shard over
        (data, space), labels over data only — parallel.batch_sharding_fn)."""
        import jax

        self._it = iter(loader)
        if callable(sharding):
            # per-leaf chooser (raw-buffer dict batches mix ranks)
            self._put = lambda x: jax.tree_util.tree_map(
                lambda a: jax.device_put(a, sharding(a)), x)
        elif sharding is not None:
            self._put = lambda x: jax.device_put(x, sharding)
        else:
            self._put = lambda x: jax.device_put(x, device)
        self._next = self._load()

    def _load(self):
        try:
            imgs, labels, infos, ids = next(self._it)
        except StopIteration:
            return None
        return self._put(imgs), self._put(labels), infos, ids

    def next(self):
        batch = self._next
        if batch is None:
            raise StopIteration
        self._next = self._load()
        return batch

    def __iter__(self):
        while True:
            try:
                yield self.next()
            except StopIteration:
                return
