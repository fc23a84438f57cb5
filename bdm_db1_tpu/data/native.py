"""Native index helpers with numpy fallbacks.

The reference builds dataset indices in C++ for speed
(reference: src/data/helpers.cpp:20-736, exports at :730-736). We ship the
same five entry points backed by a C++ shared library
(bdm_db1_tpu/data/_native/helpers.cpp, built on demand) with pure-numpy
fallbacks so the framework works before/without the native build.

Entry points:
  * build_rl_sample_idx(path_lengths, transition_num) — (path, start, end)
    triples per timestep (reference: helpers.cpp:82-115)
  * build_sample_idx(sizes, doc_idx, seq_length, num_epochs, tokens_per_epoch)
    — GPT packed-sample index (reference: helpers.cpp:117-203)
  * build_blending_indices(weights, size) — error-minimizing weighted
    round-robin (reference: helpers.cpp:20-80)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "_native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdb1helpers.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load_native() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    src = os.path.join(_NATIVE_DIR, "helpers.cpp")
    if not os.path.exists(_LIB_PATH) and os.path.exists(src):
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-std=c++17", src, "-o", _LIB_PATH],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    if os.path.exists(_LIB_PATH):
        try:
            _lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _lib = None
    return _lib


def build_rl_sample_idx(
    path_lengths: Sequence[int], transition_num: int
) -> np.ndarray:
    """(path, start, end=min(start+transition_num, length)) per timestep."""
    lengths = np.asarray(path_lengths, dtype=np.int64)
    total = int(lengths.sum())
    out = np.empty((total, 3), dtype=np.int64)
    lib = _load_native()
    if lib is not None:
        lib.build_rl_sample_idx(
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int64(len(lengths)),
            ctypes.c_int64(transition_num),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return out
    # numpy fallback
    row = 0
    for p, n in enumerate(lengths):
        n = int(n)
        starts = np.arange(n, dtype=np.int64)
        out[row: row + n, 0] = p
        out[row: row + n, 1] = starts
        out[row: row + n, 2] = np.minimum(starts + transition_num, n)
        row += n
    return out


def build_sample_idx(
    sizes: np.ndarray,
    doc_idx: np.ndarray,
    seq_length: int,
    num_epochs: int,
    tokens_per_epoch: int,
) -> np.ndarray:
    """GPT token-packing index: [num_samples+1, 2] of (doc position, offset)
    so sample i spans tokens from sample_idx[i] to sample_idx[i+1]."""
    sizes = np.asarray(sizes, dtype=np.int64)
    doc_idx = np.asarray(doc_idx, dtype=np.int64)
    num_samples = (num_epochs * tokens_per_epoch - 1) // seq_length
    out = np.zeros((num_samples + 1, 2), dtype=np.int64)
    lib = _load_native()
    if lib is not None:
        lib.build_sample_idx(
            sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            doc_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int64(seq_length),
            ctypes.c_int64(num_samples),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return out
    # numpy fallback (loop; the native path is the production one).
    # Each sample consumes seq_length+1 tokens and the boundary token is
    # shared with the next sample (Megatron semantics,
    # reference: helpers.cpp:117-203).
    cur_doc = 0
    cur_offset = 0
    out[0] = (0, 0)
    for sample in range(1, num_samples + 1):
        remaining = seq_length + 1
        while remaining > 0:
            doc_len = int(sizes[doc_idx[cur_doc]]) - cur_offset
            remaining -= doc_len
            if remaining <= 0:
                cur_offset += remaining + doc_len - 1
                remaining = 0
            else:
                cur_doc += 1
                cur_offset = 0
        out[sample] = (cur_doc, cur_offset)
    return out


def build_blending_indices(
    weights: np.ndarray, size: int
) -> tuple[np.ndarray, np.ndarray]:
    """Error-minimizing weighted round-robin over datasets
    (reference: helpers.cpp:20-80). Returns (dataset_index, dataset_sample_index)."""
    weights = np.asarray(weights, dtype=np.float64)
    n = len(weights)
    ds_index = np.empty(size, dtype=np.int32)
    ds_sample = np.empty(size, dtype=np.int64)
    lib = _load_native()
    if lib is not None:
        lib.build_blending_indices(
            weights.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_int64(n), ctypes.c_int64(size),
            ds_index.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ds_sample.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return ds_index, ds_sample
    counts = np.zeros(n, dtype=np.int64)
    for i in range(size):
        # pick dataset with max (weight * (i+1) - count) error
        err = weights * (i + 1) - counts
        j = int(np.argmax(err))
        ds_index[i] = j
        ds_sample[i] = counts[j]
        counts[j] += 1
    return ds_index, ds_sample


# ---------------------------------------------------------------------------
# BERT/ICT sentence-block maps (reference: helpers.cpp:205-728). The native
# path and the pure-python fallback below implement the identical algorithm,
# including the std::mt19937 / std::mt19937_64 draw sequences, so maps are
# bit-identical either way (enforced by tests/test_data_layer.py).
# ---------------------------------------------------------------------------

_LONG_SENTENCE_LEN = 512


class _MT19937:
    """std::mt19937-compatible generator (seed init + temper per the
    standard's mersenne_twister_engine parameters)."""

    _N, _M, _A = 624, 397, 0x9908B0DF
    _F, _W = 1812433253, 32

    def __init__(self, seed: int):
        mask = (1 << self._W) - 1
        mt = [seed & mask]
        for i in range(1, self._N):
            prev = mt[-1]
            mt.append((self._F * (prev ^ (prev >> (self._W - 2))) + i) & mask)
        self._mt = mt
        self._idx = self._N

    def _twist(self):
        mt, N, M, A = self._mt, self._N, self._M, self._A
        upper, lower = 0x80000000, 0x7FFFFFFF
        for i in range(N):
            x = (mt[i] & upper) | (mt[(i + 1) % N] & lower)
            xa = x >> 1
            if x & 1:
                xa ^= A
            mt[i] = mt[(i + M) % N] ^ xa
        self._idx = 0

    def __call__(self) -> int:
        if self._idx >= self._N:
            self._twist()
        y = self._mt[self._idx]
        self._idx += 1
        y ^= y >> 11
        y ^= (y << 7) & 0x9D2C5680
        y ^= (y << 15) & 0xEFC60000
        y ^= y >> 18
        return y & 0xFFFFFFFF


class _MT19937_64:
    """std::mt19937_64-compatible generator."""

    _N, _M, _A = 312, 156, 0xB5026F5AA96619E9
    _F, _W = 6364136223846793005, 64

    def __init__(self, seed: int):
        mask = (1 << self._W) - 1
        mt = [seed & mask]
        for i in range(1, self._N):
            prev = mt[-1]
            mt.append((self._F * (prev ^ (prev >> (self._W - 2))) + i) & mask)
        self._mt = mt
        self._idx = self._N

    def _twist(self):
        mt, N, M, A = self._mt, self._N, self._M, self._A
        upper = 0xFFFFFFFF80000000
        lower = 0x7FFFFFFF
        for i in range(N):
            x = (mt[i] & upper) | (mt[(i + 1) % N] & lower)
            xa = x >> 1
            if x & 1:
                xa ^= A
            mt[i] = mt[(i + M) % N] ^ xa
        self._idx = 0

    def __call__(self) -> int:
        if self._idx >= self._N:
            self._twist()
        y = self._mt[self._idx]
        self._idx += 1
        y ^= (y >> 29) & 0x5555555555555555
        y ^= (y << 17) & 0x71D67FFFEDA60000
        y ^= (y << 37) & 0xFFF7EEE000000000
        y ^= y >> 43
        return y & 0xFFFFFFFFFFFFFFFF


def _target_sample_len(short_seq_ratio, max_length, gen) -> int:
    if short_seq_ratio == 0:
        return max_length
    r = gen()
    if r % short_seq_ratio == 0:
        return 2 + r % (max_length - 1)
    return max_length


def _shuffle_rows(out: np.ndarray, seed: int) -> None:
    gen = _MT19937_64(seed)
    for i in range(len(out) - 1, 0, -1):
        j = gen() % (i + 1)
        tmp = out[i].copy()
        out[i] = out[j]
        out[j] = tmp


def _build_mapping_py(docs, sizes, num_epochs, max_num_samples,
                      max_seq_length, short_seq_prob, seed, min_num_sent):
    short_seq_ratio = (int(round(1.0 / short_seq_prob))
                       if short_seq_prob > 0 else 0)
    gen = _MT19937(seed)
    rows = []
    for _ in range(num_epochs):
        if len(rows) >= max_num_samples:
            break
        for d in range(len(docs) - 1):
            first, last = int(docs[d]), int(docs[d + 1])
            remain = last - first
            if remain > 1 and (sizes[first:last] > _LONG_SENTENCE_LEN).any():
                continue
            if remain < min_num_sent:
                continue
            prev_start = first
            seq_len = num_sent = 0
            target = _target_sample_len(short_seq_ratio, max_seq_length, gen)
            for s in range(first, last):
                seq_len += int(sizes[s])
                num_sent += 1
                remain -= 1
                if ((seq_len >= target and remain > 1
                     and num_sent >= min_num_sent) or remain == 0):
                    rows.append((prev_start, s + 1, target))
                    prev_start = s + 1
                    target = _target_sample_len(
                        short_seq_ratio, max_seq_length, gen)
                    seq_len = num_sent = 0
    out = np.asarray(rows, np.int64).reshape(len(rows), 3)
    _shuffle_rows(out, seed + 1)
    return out


def _build_blocks_mapping_py(docs, sizes, titles_sizes, num_epochs,
                             max_num_samples, max_seq_length, seed,
                             use_one_sent_blocks):
    min_num_sent = 1 if use_one_sent_blocks else 2
    rows = []
    for _ in range(num_epochs):
        block_id = 0
        if len(rows) >= max_num_samples:
            break
        for d in range(len(docs) - 1):
            first, last = int(docs[d]), int(docs[d + 1])
            target = max_seq_length - int(titles_sizes[d])
            remain = last - first
            if remain < min_num_sent:
                continue
            if (sizes[first:last] > _LONG_SENTENCE_LEN).any():
                continue
            prev_start = first
            seq_len = num_sent = 0
            for s in range(first, last):
                seq_len += int(sizes[s])
                num_sent += 1
                remain -= 1
                if ((seq_len >= target and remain >= min_num_sent
                     and num_sent >= min_num_sent) or remain == 0):
                    rows.append((prev_start, s + 1, d, block_id))
                    block_id += 1
                    prev_start = s + 1
                    seq_len = num_sent = 0
    out = np.asarray(rows, np.int64).reshape(len(rows), 4)
    _shuffle_rows(out, seed + 1)
    return out


def build_mapping(
    docs: np.ndarray, sizes: np.ndarray, num_epochs: int,
    max_num_samples: int, max_seq_length: int, short_seq_prob: float,
    seed: int, min_num_sent: int = 2,
) -> np.ndarray:
    """BERT-style sentence-group sample map: rows
    (sentence_start, sentence_end, target_seq_length), shuffled.
    Algorithm-exact vs the reference (helpers.cpp:221-493), including the
    mt19937 draw sequence; the sample cap applies at epoch boundaries only
    (the last epoch may overshoot), matching the reference."""
    docs = np.ascontiguousarray(docs, dtype=np.int64)
    sizes = np.ascontiguousarray(sizes, dtype=np.int32)
    lib = _load_native()
    if lib is None:
        return _build_mapping_py(docs, sizes, num_epochs, max_num_samples,
                                 max_seq_length, short_seq_prob, seed,
                                 min_num_sent)
    lib.build_mapping.restype = ctypes.c_int64
    argv = (
        docs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(docs)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int32(num_epochs), ctypes.c_uint64(max_num_samples),
        ctypes.c_int32(max_seq_length), ctypes.c_double(short_seq_prob),
        ctypes.c_uint64(seed), ctypes.c_int32(min_num_sent),
    )
    count = lib.build_mapping(*argv, ctypes.POINTER(ctypes.c_int64)())
    out = np.empty((count, 3), dtype=np.int64)
    lib.build_mapping(*argv,
                      out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out


def build_blocks_mapping(
    docs: np.ndarray, sizes: np.ndarray, titles_sizes: np.ndarray,
    num_epochs: int, max_num_samples: int, max_seq_length: int,
    seed: int, use_one_sent_blocks: bool = False,
) -> np.ndarray:
    """ICT-style block map: rows (sentence_start, sentence_end, doc,
    block_id), shuffled; per-doc target length is
    max_seq_length - titles_sizes[doc] and block ids restart each epoch.
    Algorithm-exact vs the reference (helpers.cpp:495-728)."""
    docs = np.ascontiguousarray(docs, dtype=np.int64)
    sizes = np.ascontiguousarray(sizes, dtype=np.int32)
    titles_sizes = np.ascontiguousarray(titles_sizes, dtype=np.int32)
    lib = _load_native()
    if lib is None:
        return _build_blocks_mapping_py(
            docs, sizes, titles_sizes, num_epochs, max_num_samples,
            max_seq_length, seed, use_one_sent_blocks)
    lib.build_blocks_mapping.restype = ctypes.c_int64
    argv = (
        docs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(docs)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        titles_sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int32(num_epochs), ctypes.c_uint64(max_num_samples),
        ctypes.c_int32(max_seq_length), ctypes.c_uint64(seed),
        ctypes.c_int32(1 if use_one_sent_blocks else 0),
    )
    count = lib.build_blocks_mapping(
        *argv, ctypes.POINTER(ctypes.c_int64)())
    out = np.empty((count, 4), dtype=np.int64)
    lib.build_blocks_mapping(
        *argv, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out


def native_available() -> bool:
    return _load_native() is not None
