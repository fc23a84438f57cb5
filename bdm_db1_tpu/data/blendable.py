"""Weighted multi-dataset mixture.

Two modes, both from the reference (reference: src/data/blendable_dataset.py):

* ``slot`` (the shipped default, :30-72) — weights round to per-global-batch
  slot counts; batch slot i always draws from the same dataset, sampling a
  random element inside it;
* ``index`` (the commented Megatron variant, :75-122) — a precomputed
  error-minimizing index over the full length (native
  ``build_blending_indices``), deterministic.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from bdm_db1_tpu.data import native


class BlendableDataset:
    def __init__(
        self,
        datasets: Sequence,
        weights: Sequence[float],
        global_batch_size: Optional[int] = None,
        *,
        mode: str = "slot",
        size: Optional[int] = None,
        seed: int = 1234,
    ):
        assert len(datasets) == len(weights) and len(datasets) > 0
        self.datasets = list(datasets)
        w = np.asarray(weights, dtype=np.float64)
        self.weights = w / w.sum()
        self.mode = mode
        self.rng = np.random.RandomState(seed)

        if mode == "slot":
            assert global_batch_size is not None
            counts = np.round(self.weights * global_batch_size).astype(int)
            # fix rounding drift so every slot maps somewhere
            while counts.sum() < global_batch_size:
                counts[int(np.argmax(self.weights))] += 1
            while counts.sum() > global_batch_size:
                counts[int(np.argmax(counts))] -= 1
            slot_map = []
            for ds_i, c in enumerate(counts):
                slot_map.extend([ds_i] * c)
            self._slot_map = np.asarray(slot_map, dtype=np.int32)
            self.global_batch_size = global_batch_size
            self._size = size or sum(len(d) for d in self.datasets)
        else:
            self._size = size or sum(len(d) for d in self.datasets)
            self._ds_index, self._ds_sample = native.build_blending_indices(
                self.weights, self._size)

    def __len__(self) -> int:
        return self._size

    def __getitem__(self, idx: int):
        if self.mode == "slot":
            ds_i = int(self._slot_map[idx % self.global_batch_size])
            ds = self.datasets[ds_i]
            return ds[int(self.rng.randint(len(ds)))]
        ds = self.datasets[int(self._ds_index[idx % self._size])]
        return ds[int(self._ds_sample[idx % self._size]) % len(ds)]
