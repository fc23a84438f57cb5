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


def build_mapping(
    docs: np.ndarray, sizes: np.ndarray, num_epochs: int,
    max_num_samples: int, max_seq_length: int, short_seq_prob: float,
    seed: int,
) -> np.ndarray:
    """BERT-style sentence-group sample map: rows
    (sentence_start, sentence_end, target_seq_length), shuffled
    (reference: helpers.cpp:221-470)."""
    docs = np.ascontiguousarray(docs, dtype=np.int64)
    sizes = np.ascontiguousarray(sizes, dtype=np.int64)
    lib = _load_native()
    if lib is None:
        raise RuntimeError(
            "build_mapping requires the native helper library "
            "(bdm_db1_tpu/data/_native); g++ build failed")
    lib.build_mapping.restype = ctypes.c_int64
    argv = (
        docs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(docs)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(num_epochs), ctypes.c_int64(max_num_samples),
        ctypes.c_int64(max_seq_length), ctypes.c_double(short_seq_prob),
        ctypes.c_uint64(seed),
    )
    count = lib.build_mapping(*argv, ctypes.POINTER(ctypes.c_int64)())
    out = np.empty((count, 3), dtype=np.int64)
    lib.build_mapping(*argv,
                      out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out


def build_blocks_mapping(
    docs: np.ndarray, sizes: np.ndarray, doc_ids: np.ndarray,
    num_epochs: int, max_num_samples: int, max_seq_length: int,
    short_seq_prob: float, seed: int,
) -> np.ndarray:
    """ICT-style block map: rows (sentence_start, sentence_end, doc_id,
    target_seq_length), shuffled (reference: helpers.cpp:470-728)."""
    docs = np.ascontiguousarray(docs, dtype=np.int64)
    sizes = np.ascontiguousarray(sizes, dtype=np.int64)
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    lib = _load_native()
    if lib is None:
        raise RuntimeError(
            "build_blocks_mapping requires the native helper library")
    lib.build_blocks_mapping.restype = ctypes.c_int64
    argv = (
        docs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(docs)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        doc_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(num_epochs), ctypes.c_int64(max_num_samples),
        ctypes.c_int64(max_seq_length), ctypes.c_double(short_seq_prob),
        ctypes.c_uint64(seed),
    )
    count = lib.build_blocks_mapping(
        *argv, ctypes.POINTER(ctypes.c_int64)())
    out = np.empty((count, 4), dtype=np.int64)
    lib.build_blocks_mapping(
        *argv, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out


def native_available() -> bool:
    return _load_native() is not None
