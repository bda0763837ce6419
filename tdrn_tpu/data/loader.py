"""Host-side input pipeline.

Replaces the reference's ``torch.utils.data.DataLoader`` worker processes
(SURVEY.md §3.1) with a thread-pool prefetching loader: cv2/numpy release the
GIL for decode/resize, samples land in pinned host numpy buffers, and a
bounded queue keeps a configurable number of batches in flight so the TPU
never waits on input. (The optional C++ decode path in ``csrc/`` accelerates
JPEG decode + resize; this loader is the pure-Python fallback.)
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Sequence

import numpy as np

from tdrn_tpu.data.voc import collate_batch
from tdrn_tpu.data.vid import collate_clips


class PrefetchLoader:
    """Infinite shuffled batch iterator with background prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        num_workers: int = 8,
        clip_mode: bool = False,
        seed: int = 0,
        prefetch: int = 4,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.clip_mode = clip_mode
        self.collate = collate_clips if clip_mode else collate_batch
        self.rng = np.random.default_rng(seed)
        self.pool = ThreadPoolExecutor(max_workers=num_workers)
        self.q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._thread.start()

    def _index_stream(self) -> Iterator[tuple]:
        """Yields (epoch, index); the epoch salts per-sample augmentation."""
        n = len(self.dataset)
        epoch = 0
        while True:
            for i in self.rng.permutation(n):
                yield epoch, int(i)
            epoch += 1

    def _fetch(self, job: tuple):
        epoch, i = job
        # Datasets exposing `sample(index, salt)` get a fresh per-call
        # Generator seeded by (seed, epoch, index) — thread-safe and
        # deterministic under the pool (numpy Generators are NOT thread-safe,
        # so a shared instance would corrupt the stream; VERDICT.md weak #7).
        if hasattr(self.dataset, "sample"):
            return self.dataset.sample(i, epoch)
        return self.dataset[i]

    def _produce(self):
        stream = self._index_stream()
        while not self._stop.is_set():
            try:
                idxs = [next(stream) for _ in range(self.batch_size)]
                samples = list(self.pool.map(self._fetch, idxs))
                batch = self.collate(samples)
            except Exception:
                if self._stop.is_set():
                    return  # shutdown race: pool already closed
                raise
            while not self._stop.is_set():
                try:
                    self.q.put(batch, timeout=1)
                    break
                except queue.Full:
                    continue

    def __iter__(self):
        return self

    def __next__(self):
        return self.q.get()

    def close(self):
        self._stop.set()
        self.pool.shutdown(wait=False, cancel_futures=True)


def make_loader(
    dataset,
    batch_size: int,
    num_workers: int = 8,
    clip_mode: bool = False,
    seed: int = 0,
    prefetch: int = 4,
) -> PrefetchLoader:
    return PrefetchLoader(
        dataset, batch_size, num_workers, clip_mode, seed, prefetch
    )
