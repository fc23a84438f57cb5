"""Text tokenizer: 32k GPT-2-class BPE with a dependency-light test fallback.

The reference loads/trains a HF tokenizer from ``my_tokenizer/``
(reference: src/tokenizer/text_tokenizer.py:21-54; asset
my_tokenizer/tokenizer_config.json). We expose the same minimal surface the
data layer needs — ``vocab_size``, batch ``__call__`` with
padding/truncation, ``encode``, ``decode`` — behind a small protocol, plus:

* ``HFTextTokenizer``: wraps a pretrained HF fast tokenizer directory.
* ``ByteTextTokenizer``: deterministic byte-level fallback (ids = bytes + 1,
  id 0 = ``<|endoftext|>``) so unit tests and fake envs never need assets.
* ``train_bpe_tokenizer``: trains a fresh BPE of a given vocab size from an
  iterator of text, mirroring the reference's train-from-scratch path.
"""

from __future__ import annotations

import os
from typing import Iterable, List, Optional, Protocol, Sequence


class TextTokenizer(Protocol):
    vocab_size: int
    eos_token_id: int

    def __call__(self, texts: Sequence[str], padding: Optional[str] = None,
                 truncation: bool = False, max_length: Optional[int] = None) -> dict: ...

    def encode(self, text: str) -> List[int]: ...

    def decode(self, ids: Sequence[int]) -> str: ...


class ByteTextTokenizer:
    """Byte-level tokenizer: token = byte value + 1; id 0 is EOS/pad."""

    def __init__(self, vocab_size: int = 257):
        assert vocab_size >= 257
        self.vocab_size = vocab_size
        self.eos_token_id = 0

    def encode(self, text: str) -> List[int]:
        return [b + 1 for b in text.encode("utf-8")]

    def decode(self, ids: Sequence[int]) -> str:
        data = bytes(i - 1 for i in ids if 0 < i <= 256)
        return data.decode("utf-8", errors="replace")

    def __call__(self, texts, padding=None, truncation=False, max_length=None):
        # HF semantics: a bare string is a single text, not a char sequence
        single = isinstance(texts, str)
        if single:
            texts = [texts]
        out = []
        for t in texts:
            ids = self.encode(t)
            if truncation and max_length is not None:
                ids = ids[:max_length]
            if padding == "max_length" and max_length is not None:
                ids = ids + [self.eos_token_id] * (max_length - len(ids))
            out.append(ids)
        return {"input_ids": out[0] if single else out}


class HFTextTokenizer:
    """Wraps a HF fast tokenizer; lazily imports ``transformers``."""

    def __init__(self, path: str):
        from transformers import AutoTokenizer

        self._tok = AutoTokenizer.from_pretrained(path)
        if self._tok.pad_token is None:
            self._tok.pad_token = self._tok.eos_token
        self.vocab_size = self._tok.vocab_size
        self.eos_token_id = self._tok.eos_token_id or 0

    def encode(self, text: str) -> List[int]:
        return self._tok.encode(text)

    def decode(self, ids: Sequence[int]) -> str:
        return self._tok.decode(ids)

    def __call__(self, texts, padding=None, truncation=False, max_length=None):
        return self._tok(
            list(texts), padding=padding or False, truncation=truncation,
            max_length=max_length,
        )


def train_bpe_tokenizer(texts: Iterable[str], vocab_size: int, save_path: str):
    """Train a byte-level BPE from scratch and save it HF-style."""
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size, special_tokens=["<|endoftext|>"]
    )
    tok.train_from_iterator(texts, trainer=trainer)
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        eos_token="<|endoftext|>",
        pad_token="<|endoftext|>",
    )
    fast.save_pretrained(save_path)
    return HFTextTokenizer(save_path)


def build_text_tokenizer(path: Optional[str] = None,
                         vocab_size: int = 32_000) -> TextTokenizer:
    """Resolve a text tokenizer: explicit path > $DB1_TOKENIZER_PATH > byte fallback."""
    path = path or os.environ.get("DB1_TOKENIZER_PATH")
    if path and os.path.isdir(path):
        return HFTextTokenizer(path)
    return ByteTextTokenizer(max(vocab_size, 257))
