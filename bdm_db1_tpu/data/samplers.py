"""Samplers + host-side batch assembly for training.

Counterpart of the reference data_samplers
(reference: src/data/data_samplers.py:28-277): sequential/random pretraining
samplers sharded by data-parallel rank with ``consumed_samples`` resume, and
the modality-grouping collate. Where the reference's ``my_collate_fn``
produced ragged per-type groups (one torch forward each), we bucket by
modality into **fixed-shape** numpy stacks shaped ``[accum, micro, ...]`` so
the whole global batch is one jit-compatible ``GatoBatch``.

The loader is a thread-pool prefetcher (numpy + mmap release the GIL), not
torch DataLoader worker processes.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np


class SequentialSampler:
    """DP-rank-sharded sequential order with consumed-samples resume
    (reference: data_samplers.py:112-170)."""

    def __init__(self, total_samples: int, consumed_samples: int,
                 micro_batch_size: int, dp_rank: int, dp_size: int):
        self.total = total_samples
        self.consumed = consumed_samples
        self.micro = micro_batch_size
        self.rank = dp_rank
        self.world = dp_size

    def __iter__(self) -> Iterator[List[int]]:
        batch = []
        idx = self.consumed
        while True:
            batch.append(idx % self.total)
            idx += 1
            if len(batch) == self.micro * self.world:
                lo = self.rank * self.micro
                yield batch[lo: lo + self.micro]
                batch = []


class RandomSampler:
    """Epoch-seeded randperm, DP-rank sharded, resumable
    (reference: data_samplers.py:193-277)."""

    def __init__(self, total_samples: int, consumed_samples: int,
                 micro_batch_size: int, dp_rank: int, dp_size: int,
                 seed: int = 1234):
        self.total = total_samples
        self.consumed = consumed_samples
        self.micro = micro_batch_size
        self.rank = dp_rank
        self.world = dp_size
        self.seed = seed

    def _index_stream(self) -> Iterator[int]:
        epoch = self.consumed // self.total
        offset = self.consumed % self.total
        while True:
            perm = np.random.RandomState(self.seed + epoch).permutation(
                self.total)
            yield from perm[offset:].tolist()
            offset = 0
            epoch += 1

    def __iter__(self) -> Iterator[List[int]]:
        stream = self._index_stream()
        step = self.micro * self.world
        while True:
            block = [next(stream) for _ in range(step)]
            self.consumed += step
            lo = self.rank * self.micro
            yield block[lo: lo + self.micro]


def collate_modalities(samples: Sequence[Dict[str, np.ndarray]],
                       modalities: Sequence[str]) -> Dict[str, Dict]:
    """Group sample dicts by modality and stack each field
    (fixed-shape analogue of reference my_collate_fn,
    data_samplers.py:28-42). ``samples[i]["modality"]`` picks the group."""
    groups: Dict[str, List] = {m: [] for m in modalities}
    for s in samples:
        groups[s.get("modality", "rl")].append(s)
    out = {}
    for m, items in groups.items():
        if not items:
            continue
        keys = [k for k in items[0] if k != "modality"]
        out[m] = {k: np.stack([it[k] for it in items]) for k in keys}
    return out


class RandomSeedDataset:
    """Reseeds global RNGs deterministically per sample index so worker
    threads cannot desynchronize augmentation randomness
    (reference: data_samplers.py:173-190)."""

    def __init__(self, dataset, base_seed: int = 1234):
        self.dataset = dataset
        self.base_seed = base_seed

    def __len__(self) -> int:
        return len(self.dataset)

    def set_epoch(self, epoch: int) -> None:
        self.base_seed += epoch

    def __getitem__(self, idx: int):
        import random

        seed = self.base_seed + int(idx)
        random.seed(seed)
        np.random.seed(seed % (2 ** 32))
        return self.dataset[idx]


def mixture_counts(weights: Dict[str, float], micro_batch_size: int
                   ) -> Dict[str, int]:
    """Per-micro-batch sample counts per modality (fixed across steps so the
    jitted step compiles once — the static-shape analogue of the reference's
    global-batch slot map, blendable_dataset.py:30-72)."""
    total = sum(weights.values())
    names = sorted(weights)
    counts = {m: int(round(weights[m] / total * micro_batch_size))
              for m in names}
    # fix rounding drift, never dropping a modality to zero
    while sum(counts.values()) < micro_batch_size:
        counts[max(names, key=lambda m: weights[m])] += 1
    while sum(counts.values()) > micro_batch_size:
        counts[max(names, key=lambda m: counts[m])] -= 1
    return {m: c for m, c in counts.items() if c > 0}


class StratifiedGatoLoader:
    """Yields mixed-modality batches with FIXED per-modality micro counts.

    Every ``__next__`` returns {modality: {field: [accum, c_m, ...]}} — the
    same pytree structure every step, so the sharded train step never
    recompiles. Per-modality sample order comes from the given samplers
    (DP-rank sharded, resumable)."""

    def __init__(self, datasets: Dict[str, object],
                 samplers: Dict[str, object],
                 counts: Dict[str, int], accum_steps: int,
                 num_threads: int = 2, max_prefetch: int = 4):
        assert set(datasets) == set(samplers) == set(counts)
        self.datasets = datasets
        self.iters = {m: iter(s) for m, s in samplers.items()}
        self.counts = counts
        self.accum = accum_steps
        self._q: queue.Queue = queue.Queue(maxsize=max_prefetch)
        self._err: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._lock = threading.Lock()
        self._threads = [threading.Thread(target=self._worker, daemon=True)
                         for _ in range(max(1, num_threads))]
        for t in self._threads:
            t.start()

    def _draw_indices(self):
        with self._lock:
            return {
                m: [next(self.iters[m]) for _ in range(self.accum)]
                for m in self.counts
            }

    def _worker(self):
        while not self._stop.is_set():
            try:
                plan = self._draw_indices()
                batch = {}
                for m, accum_lists in plan.items():
                    micros = []
                    for idx_list in accum_lists:
                        samples = [self.datasets[m][i] for i in idx_list]
                        keys = [k for k in samples[0] if k != "modality"]
                        micros.append({k: np.stack([s[k] for s in samples])
                                       for k in keys})
                    batch[m] = {k: np.stack([mi[k] for mi in micros])
                                for k in micros[0]}
                # timed put so a worker blocked on a full queue still
                # observes stop() and exits (a bare put would pin the
                # thread — and its batch's memory — for process lifetime)
                while not self._stop.is_set():
                    try:
                        self._q.put(batch, timeout=0.2)
                        break
                    except queue.Full:
                        continue
            except StopIteration:
                break
            except Exception as e:  # surface worker errors to the consumer
                self._err.put(e)
                break

    def __iter__(self):
        return self

    def __next__(self):
        while True:
            if not self._err.empty():
                raise self._err.get()
            try:
                return self._q.get(timeout=1.0)
            except queue.Empty:
                if all(not t.is_alive() for t in self._threads):
                    raise StopIteration

    def stop(self):
        self._stop.set()
        for t in self._threads:
            t.join(timeout=1.0)


class PrefetchLoader:
    """Thread-pool prefetching loader: sampler indices -> stacked batches."""

    def __init__(self, dataset, sampler, *, accum_steps: int = 1,
                 num_threads: int = 2, max_prefetch: int = 4,
                 to_batch: Optional[Callable] = None):
        self.dataset = dataset
        self.sampler_iter = iter(sampler)
        self.accum = accum_steps
        self.to_batch = to_batch
        self._q: queue.Queue = queue.Queue(maxsize=max_prefetch)
        self._err: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(max(1, num_threads))
        ]
        self._lock = threading.Lock()
        for t in self._threads:
            t.start()

    def _next_indices(self) -> List[List[int]]:
        with self._lock:
            return [next(self.sampler_iter) for _ in range(self.accum)]

    def _worker(self) -> None:
        while not self._stop.is_set():
            try:
                micro_indices = self._next_indices()
            except StopIteration:
                break
            try:
                micros = []
                for idx_list in micro_indices:
                    samples = [self.dataset[i] for i in idx_list]
                    keys = [k for k in samples[0] if k != "modality"]
                    micros.append(
                        {k: np.stack([s[k] for s in samples]) for k in keys})
                keys = micros[0].keys()
                stacked = {k: np.stack([m[k] for m in micros]) for k in keys}
                if self.to_batch is not None:
                    stacked = self.to_batch(stacked)
                self._q.put(stacked)
            except Exception as e:
                self._err.put(e)
                break

    def __iter__(self):
        return self

    def __next__(self):
        while True:
            if not self._err.empty():
                raise self._err.get()
            try:
                return self._q.get(timeout=1.0)
            except queue.Empty:
                if all(not t.is_alive() for t in self._threads):
                    raise StopIteration

    def stop(self) -> None:
        self._stop.set()
