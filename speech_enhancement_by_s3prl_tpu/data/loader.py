"""Host-side input pipeline: threaded prefetching loader with bucketed
static padding.

TPU-native replacement for the reference's torch ``DataLoader`` with 12
worker processes (/root/reference/runner.py:203-213): decode/mix on host
threads (audio decode releases the GIL inside numpy), pad every batch to a
static duration bucket so each bucket hits one cached XLA executable, and
keep a bounded prefetch queue so device steps overlap host I/O. OOM-retry
machinery from the reference (runner.py:504-508) is unnecessary here: all
shapes are static, memory use is decided at compile time (SURVEY.md
section 2.10).
"""
from __future__ import annotations

import queue
import random
import threading
from typing import Iterator, List, Optional, Sequence


def bucket_length(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n (falls back to the largest bucket)."""
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def default_buckets(sample_rate: int = 16000, max_time_ms: int = 10000) -> List[int]:
    """Duration buckets in samples: 1s, 2s, 4s, 6s, 8s, max. Bounded shape
    count keeps XLA recompiles finite while wasting little padding."""
    secs = [1, 2, 4, 6, 8]
    out = [s * sample_rate for s in secs if s * 1000 < max_time_ms]
    out.append(sample_rate * max_time_ms // 1000)
    return out


class DataLoader:
    """Iterable over collated batches with optional shuffling, threaded
    prefetch, and bucket padding.

    Yields whatever ``dataset.collate_fn`` returns: (lengths, wavs) or
    (lengths, wavs, cases) with wavs (B, C, T_bucket).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 2,
        drop_last: bool = False,
        buckets: Optional[Sequence[int]] = None,
        prefetch: int = 4,
        seed: Optional[int] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.buckets = list(buckets) if buckets is not None else None
        self.prefetch = prefetch
        self.seed = seed
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _batch_indices(self) -> List[List[int]]:
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            # no explicit seed -> draw one from the GLOBAL RNG so the
            # reference's reseed-at-eval contract governs batch order too
            seed = (
                random.getrandbits(63) if self.seed is None
                else self.seed + self._epoch
            )
            random.Random(seed).shuffle(idx)
        batches = [
            idx[i : i + self.batch_size] for i in range(0, len(idx), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        return batches

    def _collate(self, samples):
        if self.buckets is None:
            return self.dataset.collate_fn(samples)
        wavs = [s[0] if isinstance(s, tuple) else s for s in samples]
        max_len = max(w.shape[0] for w in wavs)
        pad_to = bucket_length(max_len, self.buckets)
        return self.dataset.collate_fn(samples, pad_to=pad_to)

    def __iter__(self) -> Iterator:
        batches = self._batch_indices()
        self._epoch += 1
        # Per-item RNG streams: one base seed per epoch drawn from the
        # GLOBAL RNG in the main thread (so the reference's reseed-at-eval
        # contract still governs all draws), then a derived seed per item.
        # This makes the data stream identical for any worker count and
        # any thread schedule (torch's process workers don't even manage
        # that — data changes with num_workers there).
        from .datasets import set_item_seed

        base = random.getrandbits(63)
        pos = 0
        seeds: List[List[int]] = []
        for b in batches:
            seeds.append([(base + 0x9E3779B97F4A7C15 * (pos + k)) % 2**63
                          for k in range(len(b))])
            pos += len(b)

        def fetch(i, b):
            items = []
            for j, s in zip(b, seeds[i]):
                set_item_seed(s)
                try:
                    items.append(self.dataset[j])
                finally:
                    set_item_seed(None)
            return self._collate(items)

        if self.num_workers <= 1 or len(batches) <= 1:
            for i, b in enumerate(batches):
                yield fetch(i, b)
            return

        results = {}
        results_lock = threading.Condition()
        task_q: "queue.Queue" = queue.Queue()
        for i, b in enumerate(batches):
            task_q.put((i, b))
        stop = threading.Event()
        # completed-but-unconsumed batches are capped at `prefetch`: a
        # worker that just stored a result waits for the consumer to drain
        # before taking another task, so a slow consumer bounds host memory
        # instead of the whole epoch being decoded ahead. The batch the
        # consumer is waiting on is always already in flight (tasks are
        # taken in order), so this cannot deadlock.
        cap = max(1, self.prefetch)

        def worker():
            while not stop.is_set():
                try:
                    i, b = task_q.get_nowait()
                except queue.Empty:
                    return
                try:
                    batch = fetch(i, b)
                    err = None
                except Exception as e:  # surface in consumer
                    batch, err = None, e
                with results_lock:
                    results[i] = (batch, err)
                    results_lock.notify_all()
                    while len(results) >= cap and not stop.is_set():
                        results_lock.wait(timeout=1.0)

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.num_workers)
        ]
        for t in threads:
            t.start()

        try:
            for i in range(len(batches)):
                with results_lock:
                    while i not in results:
                        results_lock.wait(timeout=60.0)
                        if i not in results and not any(t.is_alive() for t in threads):
                            raise RuntimeError("all loader workers died")
                    batch, err = results.pop(i)
                    results_lock.notify_all()  # wake workers gated on `cap`
                if err is not None:
                    raise err
                yield batch
        finally:
            stop.set()


def device_prefetch(iterator, size: int = 2):
    """Double-buffered host->device feeding: transfer the next `size`
    batches while the device chews on the current one (the TPU-side
    equivalent of the reference's DataLoader worker prefetch,
    /root/reference/runner.py:211)."""
    import collections

    import jax

    queue = collections.deque()

    def put(batch):
        return tuple(
            jax.device_put(x) if hasattr(x, "shape") else x for x in batch
        )

    it = iter(iterator)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        batch = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield batch


def infinite_iterator(loader: DataLoader):
    """Restarting iterator (the reference's try/except-StopIteration reload,
    /root/reference/runner.py:384-388)."""
    while True:
        for batch in loader:
            yield batch
