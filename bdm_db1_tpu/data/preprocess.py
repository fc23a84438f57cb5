"""Corpus preprocessing CLI: raw text/jsonl -> Megatron .bin/.idx.

The reference ships only a "Coming Soon" stub
(reference: src/preprocess/__init__.py:14; SURVEY.md §2.9) while its data
layer expects preprocessed indexed corpora. This supplies the tool:

    python -m bdm_db1_tpu.data.preprocess \
        --input corpus.jsonl --json-key text \
        --output-prefix /data/pile --tokenizer-path my_tokenizer \
        --workers 8

Documents are sentence-split + BPE-encoded (data/text_codec.Encoder), EOD-
terminated, and appended through the MMap builder; uint16 storage when the
vocab allows.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import sys
import time
from typing import Iterator, List

from bdm_db1_tpu.data.indexed_dataset import make_builder
from bdm_db1_tpu.data.text_codec import Encoder
from bdm_db1_tpu.tokenizers.text import build_text_tokenizer

_ENC = None


def _init_worker(tokenizer_path: str, vocab_size: int, split: bool):
    global _ENC
    tok = build_text_tokenizer(tokenizer_path, vocab_size)
    _ENC = Encoder(tok, append_eod=True, split_into_sentences=split)


def _encode_doc(text: str) -> List[int]:
    return _ENC.encode_flat(text)


def _iter_docs(path: str, json_key: str) -> Iterator[str]:
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if json_key:
                try:
                    yield json.loads(line)[json_key]
                except (json.JSONDecodeError, KeyError):
                    continue
            else:
                yield line


def main(argv=None) -> None:
    ap = argparse.ArgumentParser("preprocess")
    ap.add_argument("--input", required=True)
    ap.add_argument("--json-key", default="",
                    help="jsonl field holding the text; empty = plain lines")
    ap.add_argument("--output-prefix", required=True)
    ap.add_argument("--tokenizer-path", default=None)
    ap.add_argument("--vocab-size", type=int, default=32_000)
    ap.add_argument("--dataset-impl", default="mmap",
                    choices=["mmap", "lazy"])
    ap.add_argument("--workers", type=int, default=1)
    ap.add_argument("--no-sentence-split", action="store_true")
    args = ap.parse_args(argv)

    builder = make_builder(args.output_prefix, impl=args.dataset_impl,
                           vocab_size=args.vocab_size)
    docs = _iter_docs(args.input, args.json_key)
    t0 = time.time()
    n_docs = n_tokens = 0

    if args.workers > 1:
        with mp.Pool(
            args.workers, initializer=_init_worker,
            initargs=(args.tokenizer_path, args.vocab_size,
                      not args.no_sentence_split),
        ) as pool:
            for ids in pool.imap(_encode_doc, docs, chunksize=32):
                if ids:
                    builder.add_document(ids)
                    n_docs += 1
                    n_tokens += len(ids)
    else:
        _init_worker(args.tokenizer_path, args.vocab_size,
                     not args.no_sentence_split)
        for text in docs:
            ids = _encode_doc(text)
            if ids:
                builder.add_document(ids)
                n_docs += 1
                n_tokens += len(ids)

    builder.finalize()
    dt = time.time() - t0
    print(f"wrote {n_docs} docs / {n_tokens} tokens to "
          f"{args.output_prefix}.bin (+.idx) in {dt:.1f}s "
          f"({n_tokens / max(dt, 1e-9):,.0f} tok/s)", file=sys.stderr)


if __name__ == "__main__":
    main()
