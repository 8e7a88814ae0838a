"""Host-side threaded batching + device prefetch.

Replaces the reference's 10-worker pinned-memory torch DataLoader and the
preallocated-buffer ``set_input`` H2D staging
(``kitti/train_classifier.py:37-38``,
``models/multimodal_classifier.py:51-58,86-93``): worker threads assemble
numpy samples, a bounded queue holds collated batches, and batches are
``device_put`` ahead of consumption so the TPU never waits on the host.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, Optional

import jax
import numpy as np

from .base import collate


class BatchLoader:
    """Threaded sample->batch pipeline over any indexable dataset."""

    def __init__(self, dataset, batch_size: int, *, shuffle: bool = True,
                 num_workers: int = 4, drop_last: bool = True,
                 seed: int = 0, prefetch: int = 4,
                 skip_errors: bool = False):
        """``skip_errors=True`` substitutes another sample when one fails to
        load (corrupt file etc.) instead of killing the epoch — the
        reference dies on any worker exception (SURVEY.md §5 'failure
        detection: none')."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.skip_errors = skip_errors
        self.error_count = 0

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed).shuffle(order)
        batches = [order[i:i + self.batch_size]
                   for i in range(0, len(order), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        task_q: queue.Queue = queue.Queue()
        out: Dict[int, Dict] = {}
        out_lock = threading.Condition()
        next_bi = [0]              # next batch the consumer needs
        stop = [False]             # consumer gone -> workers drain out
        cap = self.prefetch + self.num_workers
        for bi, idxs in enumerate(batches):
            task_q.put((bi, idxs))

        def fetch(i: int):
            if not self.skip_errors:
                return self.dataset[int(i)]
            for attempt in range(8):
                try:
                    return self.dataset[int((i + attempt) % len(self.dataset))]
                except Exception:
                    self.error_count += 1
            raise RuntimeError(f"8 consecutive sample failures near idx {i}")

        def worker():
            while not stop[0]:
                try:
                    bi, idxs = task_q.get_nowait()
                except queue.Empty:
                    return
                samples = [fetch(int(i)) for i in idxs]
                batch = collate(samples)
                with out_lock:
                    # backpressure: bounded ready-buffer, but never block
                    # the batch the consumer is waiting for (deadlock-free)
                    while (len(out) >= cap and bi != next_bi[0]
                           and not stop[0]):
                        out_lock.wait()
                    if stop[0]:
                        return
                    out[bi] = batch
                    out_lock.notify_all()

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        try:
            for bi in range(len(batches)):
                with out_lock:
                    while bi not in out:
                        out_lock.wait()
                    batch = out.pop(bi)
                    next_bi[0] = bi + 1
                    out_lock.notify_all()
                yield batch
        finally:
            # abandoned or exhausted iterator: release the workers
            with out_lock:
                stop[0] = True
                out_lock.notify_all()


def device_prefetch(iterator: Iterator[Dict[str, np.ndarray]],
                    *, size: int = 2,
                    placer: Optional[Callable] = None):
    """Keep ``size`` batches resident on device ahead of the consumer."""
    placer = placer or (lambda b: jax.device_put(b))
    buf = []
    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(placer(next(it)))
    except StopIteration:
        pass
    while buf:
        nxt = buf.pop(0)
        try:
            buf.append(placer(next(it)))
        except StopIteration:
            pass
        yield nxt
