"""Data-layer tests: indexed datasets (format roundtrip, partial reads),
GPT packing maps, blendable mixture, samplers, prefetch loader, native
helpers vs numpy fallbacks."""

import numpy as np
import pytest

from bdm_db1_tpu.data import native
from bdm_db1_tpu.data.blendable import BlendableDataset
from bdm_db1_tpu.data.gpt_dataset import GPTDataset
from bdm_db1_tpu.data.indexed_dataset import (
    IndexedCachedDataset,
    IndexedDataset,
    IndexedDatasetBuilder,
    MMapIndexedDataset,
    MMapIndexedDatasetBuilder,
    make_builder,
    make_dataset,
)
from bdm_db1_tpu.data.samplers import (
    PrefetchLoader,
    RandomSampler,
    SequentialSampler,
)
from bdm_db1_tpu.data.dataset_utils import (
    build_train_valid_test_datasets,
    get_datasets_weights_and_types,
    get_train_valid_test_split_,
)


def _write_corpus(tmp_path, docs, impl="mmap"):
    prefix = str(tmp_path / "corpus")
    b = make_builder(prefix, impl=impl, vocab_size=1000)
    for d in docs:
        b.add_item(np.asarray(d))
        if impl == "mmap":
            b.end_document()
    b.finalize()
    return prefix


DOCS = [list(range(10)), list(range(100, 120)), [7] * 5, list(range(50))]


def test_mmap_roundtrip_and_partial_reads(tmp_path):
    prefix = _write_corpus(tmp_path, DOCS)
    ds = MMapIndexedDataset(prefix)
    assert len(ds) == 4
    assert ds.dtype == np.uint16  # vocab<65500 auto-picks uint16
    np.testing.assert_array_equal(ds[1], DOCS[1])
    np.testing.assert_array_equal(ds.get(1, offset=5, length=3),
                                  DOCS[1][5:8])
    np.testing.assert_array_equal(ds.doc_idx, [0, 1, 2, 3, 4])


def test_mmap_merge(tmp_path):
    p1 = _write_corpus(tmp_path, DOCS[:2])
    b = MMapIndexedDatasetBuilder(str(tmp_path / "merged"), dtype=np.uint16)
    b.add_item(np.asarray(DOCS[2]))
    b.end_document()
    b.merge_file_(p1)
    b.finalize()
    ds = MMapIndexedDataset(str(tmp_path / "merged"))
    assert len(ds) == 3
    np.testing.assert_array_equal(ds[1], DOCS[0])
    np.testing.assert_array_equal(ds[2], DOCS[1])


def test_legacy_roundtrip(tmp_path):
    prefix = str(tmp_path / "legacy")
    b = IndexedDatasetBuilder(prefix, dtype=np.int32)
    for d in DOCS:
        b.add_item(np.asarray(d))
    b.finalize()
    ds = IndexedDataset(prefix)
    np.testing.assert_array_equal(ds[2], DOCS[2])
    cached = IndexedCachedDataset(prefix)
    cached.prefetch([0, 3])
    np.testing.assert_array_equal(cached[3], DOCS[3])
    np.testing.assert_array_equal(cached[1], DOCS[1])


def _reference_tntidx_bytes(docs, dtype, doc_ends):
    """Build .idx/.bin bytes per the reference legacy writer's documented
    layout (reference: src/data/indexed_dataset.py:330-342 —
    magic, <Q version, <QQ dtype-code/element-size, <QQ len/s, <Q doc-count,
    then int64 dim_offsets / data_offsets / sizes / doc_idx; .bin is the
    raw concatenation). Hand-assembled here so the test is a true
    golden-bytes check of cross-reading reference-written files."""
    import struct

    from bdm_db1_tpu.data.indexed_dataset import dtype_code

    dtype = np.dtype(dtype)
    arrays = [np.asarray(d, dtype=dtype) for d in docs]
    bin_bytes = b"".join(a.tobytes() for a in arrays)
    data_offsets = np.cumsum([0] + [a.size for a in arrays])
    dim_offsets = np.cumsum([0] + [a.ndim for a in arrays])
    sizes = [s for a in arrays for s in a.shape]
    doc_idx = [0] + list(doc_ends)
    idx = (b"TNTIDX\x00\x00"
           + struct.pack("<Q", 1)
           + struct.pack("<QQ", dtype_code(dtype), dtype.itemsize)
           + struct.pack("<QQ", len(arrays), len(sizes))
           + struct.pack("<Q", len(doc_idx))
           + np.asarray(dim_offsets, np.int64).tobytes()
           + np.asarray(data_offsets, np.int64).tobytes()
           + np.asarray(sizes, np.int64).tobytes()
           + np.asarray(doc_idx, np.int64).tobytes())
    return idx, bin_bytes


def test_legacy_reads_reference_written_bytes(tmp_path):
    """Cross-compat: bytes laid out exactly as the reference legacy writer
    produces them must parse (docs, partial metadata, doc_idx)."""
    doc_ends = [1, 2, 3, 4]  # end_document after every sentence
    idx, binb = _reference_tntidx_bytes(DOCS, np.int32, doc_ends)
    prefix = str(tmp_path / "refbytes")
    with open(prefix + ".idx", "wb") as f:
        f.write(idx)
    with open(prefix + ".bin", "wb") as f:
        f.write(binb)
    ds = IndexedDataset(prefix)
    assert len(ds) == len(DOCS)
    for i, d in enumerate(DOCS):
        np.testing.assert_array_equal(ds[i], d)
    np.testing.assert_array_equal(ds.doc_idx, [0] + doc_ends)


def test_legacy_writer_matches_reference_bytes(tmp_path):
    """Our legacy builder must emit byte-identical .idx/.bin to the
    reference writer for the same documents (so files we write are loadable
    by the reference and vice versa)."""
    prefix = str(tmp_path / "ours")
    b = IndexedDatasetBuilder(prefix, dtype=np.int32)
    for d in DOCS:
        b.add_document(np.asarray(d))
    b.finalize()
    golden_idx, golden_bin = _reference_tntidx_bytes(
        DOCS, np.int32, [1, 2, 3, 4])
    with open(prefix + ".idx", "rb") as f:
        assert f.read() == golden_idx
    with open(prefix + ".bin", "rb") as f:
        assert f.read() == golden_bin


def test_legacy_merge(tmp_path):
    p1 = str(tmp_path / "part1")
    b = IndexedDatasetBuilder(p1, dtype=np.int32)
    for d in DOCS[:2]:
        b.add_document(np.asarray(d))
    b.finalize()
    b = IndexedDatasetBuilder(str(tmp_path / "lmerged"), dtype=np.int32)
    b.add_document(np.asarray(DOCS[2]))
    b.merge_file_(p1)
    b.finalize()
    ds = IndexedDataset(str(tmp_path / "lmerged"))
    assert len(ds) == 3
    np.testing.assert_array_equal(ds[0], DOCS[2])
    np.testing.assert_array_equal(ds[1], DOCS[0])
    np.testing.assert_array_equal(ds[2], DOCS[1])
    np.testing.assert_array_equal(ds.doc_idx, [0, 1, 2, 3])


def test_build_sample_idx_spans():
    sizes = np.array([10, 20, 5, 50])
    doc_idx = np.array([0, 1, 2, 3])
    tokens_per_epoch = 85
    seq = 16
    idx = native.build_sample_idx(sizes, doc_idx, seq, 1, tokens_per_epoch)
    # walk the spans: each sample covers exactly seq+1 tokens w/ 1 overlap
    assert idx.shape == ((tokens_per_epoch - 1) // seq + 1, 2)
    flat = []
    for d in doc_idx:
        flat.extend(range(sizes[d]))
    for i in range(len(idx) - 1):
        (d0, o0), (d1, o1) = idx[i], idx[i + 1]
        start = sum(sizes[doc_idx[k]] for k in range(d0)) + o0
        end = sum(sizes[doc_idx[k]] for k in range(d1)) + o1
        assert end - start == seq


def test_gpt_dataset_samples(tmp_path):
    rng = np.random.RandomState(0)
    docs = [rng.randint(0, 999, size=rng.randint(5, 60)).tolist()
            for _ in range(20)]
    prefix = _write_corpus(tmp_path, docs)
    indexed = make_dataset(prefix)
    ds = GPTDataset("train", indexed, np.arange(20), num_samples=30,
                    seq_length=32, seed=0, cache_dir=str(tmp_path / "cache"))
    assert len(ds) >= 30
    s = ds[0]
    assert s["tokens"].shape == (32,)
    np.testing.assert_array_equal(s["label"][:-1], s["tokens"][1:])
    # cached maps reload identically
    ds2 = GPTDataset("train", indexed, np.arange(20), num_samples=30,
                     seq_length=32, seed=0, cache_dir=str(tmp_path / "cache"))
    np.testing.assert_array_equal(ds[5]["tokens"], ds2[5]["tokens"])


class _Const:
    def __init__(self, value, n=100):
        self.value, self.n = value, n

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        return self.value


def test_blendable_slot_mode_proportions():
    ds = BlendableDataset([_Const("a"), _Const("b")], [0.75, 0.25],
                          global_batch_size=8)
    got = [ds[i] for i in range(8)]
    assert got.count("a") == 6 and got.count("b") == 2


def test_blendable_index_mode_proportions():
    ds = BlendableDataset([_Const("a"), _Const("b")], [0.7, 0.3],
                          mode="index", size=1000)
    got = [ds[i] for i in range(1000)]
    assert abs(got.count("a") - 700) <= 1


def test_blending_indices_native_matches_fallback():
    w = np.array([0.5, 0.3, 0.2])
    di, dsamp = native.build_blending_indices(w, 100)
    counts = np.bincount(di, minlength=3)
    np.testing.assert_allclose(counts / 100, w, atol=0.02)
    # per-dataset sample indices are sequential
    for k in range(3):
        np.testing.assert_array_equal(dsamp[di == k],
                                      np.arange(counts[k]))


def test_samplers_shard_and_resume():
    seqs = [list(SequentialSampler(20, 0, 2, r, 2).__iter__().__next__())
            for r in range(2)]
    assert seqs[0] == [0, 1] and seqs[1] == [2, 3]

    it = iter(RandomSampler(50, 0, 4, 0, 1, seed=7))
    a1 = next(it)
    it2 = iter(RandomSampler(50, 0, 4, 0, 1, seed=7))
    assert next(it2) == a1  # deterministic
    # rank sharding covers disjoint indices within the same step
    r0 = next(iter(RandomSampler(64, 0, 4, 0, 2, seed=3)))
    r1 = next(iter(RandomSampler(64, 0, 4, 1, 2, seed=3)))
    assert not set(r0) & set(r1)


def test_prefetch_loader_batches():
    class DS:
        def __len__(self):
            return 100

        def __getitem__(self, i):
            return {"x": np.full((4,), i, np.int32)}

    loader = PrefetchLoader(DS(), SequentialSampler(100, 0, 2, 0, 1),
                            accum_steps=3, num_threads=1)
    batch = next(loader)
    assert batch["x"].shape == (3, 2, 4)
    loader.stop()


def test_split_string():
    idx = get_train_valid_test_split_("90,5,5", 100)
    assert idx == [0, 90, 95, 100]
    w, p, t = get_datasets_weights_and_types(
        ["2", "x", "nlp", "1", "y", "rl"])
    assert abs(w[0] - 2 / 3) < 1e-9 and p == ["x", "y"] and t == ["nlp", "rl"]


def test_factory_nlp_blend(tmp_path):
    rng = np.random.RandomState(0)
    docs = [rng.randint(0, 999, size=30).tolist() for _ in range(30)]
    p1 = _write_corpus(tmp_path / "a" if False else tmp_path, docs)
    tr, va, te, no_blend = build_train_valid_test_datasets(
        ["1.0", p1, "nlp"], "80,10,10", 16, (20, 5, 5), seed=0,
        global_batch_size=4, cache_dir=str(tmp_path / "maps"))
    assert tr is not None and va is not None
    item = tr[0]
    assert item["modality"] == "nlp"
    assert item["tokens"].shape == (16,)
    assert "nlp" in no_blend


def test_native_mapping_builders():
    docs = np.array([0, 3, 5, 9])
    sizes = np.array([5, 8, 3, 10, 2, 4, 4, 4, 4])
    if not native.native_available():
        pytest.skip("native helpers unavailable")
    m = native.build_mapping(docs, sizes, num_epochs=2, max_num_samples=100,
                             max_seq_length=12, short_seq_prob=0.1, seed=7)
    assert m.ndim == 2 and m.shape[1] == 3
    assert (m[:, 0] < m[:, 1]).all()
    assert (m[:, 2] <= 12).all() and (m[:, 2] >= 2).all()
    np.testing.assert_array_equal(
        m, native.build_mapping(docs, sizes, 2, 100, 12, 0.1, 7))

    b = native.build_blocks_mapping(
        docs, sizes, np.array([1, 2, 3]), 2, 100, 12, seed=7)
    assert b.shape[1] == 4
    assert set(b[:, 2].tolist()) <= {0, 1, 2}  # doc index, not an id remap


def _mapping_corpus(seed=0, n_docs=40):
    """Fixed corpus with every structural case: empty docs, one-sentence
    docs, long-sentence docs (>512), and multi-sentence docs."""
    rng = np.random.RandomState(seed)
    sizes, docs = [], [0]
    for d in range(n_docs):
        kind = d % 5
        if kind == 0:
            n_sent = 0  # empty doc
        elif kind == 1:
            n_sent = 1  # one-sentence doc
        else:
            n_sent = rng.randint(2, 8)
        for _ in range(n_sent):
            sizes.append(int(rng.randint(3, 40)))
        if kind == 4 and n_sent:
            sizes[-1] = 600  # long sentence -> doc excluded
        docs.append(len(sizes))
    return np.asarray(docs, np.int64), np.asarray(sizes, np.int32)


@pytest.mark.parametrize("min_num_sent,short_prob", [(2, 0.1), (1, 0.0)])
def test_build_mapping_native_matches_python_port(min_num_sent, short_prob):
    """Golden check: the native build_mapping must produce bit-identical
    rows (including mt19937 target draws and the mt19937_64 shuffle order)
    to the pure-python port of the reference algorithm."""
    if not native.native_available():
        pytest.skip("native helpers unavailable")
    docs, sizes = _mapping_corpus()
    for epochs, cap in [(1, 10**9), (3, 25)]:
        got = native.build_mapping(
            docs, sizes, epochs, cap, 64, short_prob, 1234, min_num_sent)
        want = native._build_mapping_py(
            docs, sizes, epochs, cap, 64, short_prob, 1234, min_num_sent)
        np.testing.assert_array_equal(got, want)
    assert len(native.build_mapping(
        docs, sizes, 3, 10**9, 64, short_prob, 1234, min_num_sent)) > 0


@pytest.mark.parametrize("one_sent", [False, True])
def test_build_blocks_mapping_native_matches_python_port(one_sent):
    if not native.native_available():
        pytest.skip("native helpers unavailable")
    docs, sizes = _mapping_corpus(seed=3)
    titles = np.arange(len(docs) - 1, dtype=np.int32) % 7
    for epochs, cap in [(2, 10**9), (2, 13)]:
        got = native.build_blocks_mapping(
            docs, sizes, titles, epochs, cap, 64, 99, one_sent)
        want = native._build_blocks_mapping_py(
            docs, sizes, titles, epochs, cap, 64, 99, one_sent)
        np.testing.assert_array_equal(got, want)
    full = native.build_blocks_mapping(
        docs, sizes, titles, 1, 10**9, 64, 99, one_sent)
    assert (full[:, 1] > full[:, 0]).all()
    if not one_sent:
        # every emitted block came from a doc with >= 2 sentences
        doc_lens = (docs[1:] - docs[:-1])[full[:, 2]]
        assert (doc_lens >= 2).all()
