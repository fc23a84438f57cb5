"""Dataset factory: ``--data-path (weight, prefix, type)*`` triples ->
blended train/valid/test datasets.

Counterpart of the reference factory
(reference: src/data/dataset_utils.py:40-278): parses the weighted dataset
spec, builds per-type splits from a creator registry ({nlp, rl,
rl_task_suite, ic, vqa}), blends with BlendableDataset, and can return the
unblended per-type valid sets for modality-specific eval
(``valid_no_blend``).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from bdm_db1_tpu.data.blendable import BlendableDataset
from bdm_db1_tpu.data.gpt_dataset import GPTDataset
from bdm_db1_tpu.data.indexed_dataset import MMapIndexedDataset, make_dataset


def get_datasets_weights_and_types(data_path: Sequence[str]):
    """Parse (weight, prefix, type)* triples
    (reference: dataset_utils.py:244-278)."""
    assert len(data_path) % 3 == 0, "data-path must be (weight prefix type)*"
    weights, prefixes, types = [], [], []
    for i in range(0, len(data_path), 3):
        weights.append(float(data_path[i]))
        prefixes.append(data_path[i + 1])
        types.append(data_path[i + 2])
    s = sum(weights)
    return [w / s for w in weights], prefixes, types


def get_train_valid_test_split_(splits_string: str, size: int) -> List[int]:
    """'90,5,5'-style document split boundaries
    (reference: dataset_utils.py get_train_valid_test_split_)."""
    splits = [float(s) for s in splits_string.split(",")]
    while len(splits) < 3:
        splits.append(0.0)
    splits = splits[:3]
    total = sum(splits)
    assert total > 0
    splits = [s / total for s in splits]
    index = [0]
    for s in splits:
        index.append(index[-1] + int(round(s * float(size))))
    diff = index[-1] - size
    index = [max(0, i - diff) if n == 3 else i for n, i in enumerate(index)]
    index[-1] = size
    return index


def build_nlp_splits(prefix: str, splits_string: str, seq_length: int,
                     num_samples: Tuple[int, int, int], seed: int,
                     cache_dir: Optional[str] = None):
    indexed = make_dataset(prefix, impl="mmap")
    total_docs = len(indexed.doc_idx) - 1
    splits = get_train_valid_test_split_(splits_string, total_docs)
    out = []
    for i, name in enumerate(("train", "valid", "test")):
        if splits[i + 1] > splits[i] and num_samples[i] > 0:
            docs = np.arange(splits[i], splits[i + 1], dtype=np.int32)
            out.append(GPTDataset(
                f"{name}", indexed, docs, num_samples[i], seq_length,
                seed=seed, cache_dir=cache_dir))
        else:
            out.append(None)
    return tuple(out)


class NLPSampleAdapter:
    """Wraps GPTDataset items with the modality tag for collation."""

    def __init__(self, ds: GPTDataset):
        self.ds = ds

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, idx):
        item = self.ds[idx]
        item["modality"] = "nlp"
        return item


class RLSampleAdapter:
    def __init__(self, ds):
        self.ds = ds

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, idx):
        item = self.ds[idx]
        item["modality"] = "rl"
        return item


DATASET_CREATORS: Dict[str, Callable] = {}


def register_creator(name: str, fn: Callable) -> None:
    """Creator signature: fn(prefix, split, seq_length, num_samples, seed,
    **ctx) -> (train, valid, test)."""
    DATASET_CREATORS[name] = fn


def build_train_valid_test_datasets(
    data_path: Sequence[str],
    splits_string: str,
    seq_length: int,
    train_valid_test_num_samples: Tuple[int, int, int],
    seed: int,
    global_batch_size: int,
    *,
    cache_dir: Optional[str] = None,
    creator_context: Optional[Dict] = None,
):
    """-> (train, valid, test, valid_no_blend) where the first three are
    BlendableDataset (or the single dataset) and valid_no_blend is a
    {type: dataset} dict (reference: dataset_utils.py:47-136)."""
    weights, prefixes, types = get_datasets_weights_and_types(data_path)
    ctx = creator_context or {}

    trains, valids, tests = [], [], []
    valid_no_blend: Dict[str, List] = {}
    for w, prefix, typ in zip(weights, prefixes, types):
        if typ == "nlp":
            tr, va, te = build_nlp_splits(
                prefix, splits_string, seq_length,
                train_valid_test_num_samples, seed, cache_dir=cache_dir)
            tr = NLPSampleAdapter(tr) if tr else None
            va = NLPSampleAdapter(va) if va else None
            te = NLPSampleAdapter(te) if te else None
        elif typ in DATASET_CREATORS:
            tr, va, te = DATASET_CREATORS[typ](
                prefix, splits_string, seq_length,
                train_valid_test_num_samples, seed, **ctx)
        else:
            raise ValueError(f"unknown dataset type {typ!r}")
        trains.append(tr)
        valids.append(va)
        tests.append(te)
        if va is not None:
            valid_no_blend.setdefault(typ, []).append(va)

    def blend(parts, keep_weights):
        live = [(p, w) for p, w in zip(parts, keep_weights) if p is not None]
        if not live:
            return None
        if len(live) == 1:
            return live[0][0]
        return BlendableDataset(
            [p for p, _ in live], [w for _, w in live],
            global_batch_size=global_batch_size, seed=seed)

    return (blend(trains, weights), blend(valids, weights),
            blend(tests, weights), valid_no_blend)
