"""Image-captioning evaluation — the module the reference imports but never
shipped (reference: src/train_utils/train.py:24 imports
src/evaluation/evaluate_ic; SURVEY.md §2.9).

Greedy caption generation with the K/V cache: one device call folds the
[prompt | image patches] prefix in, then a fixed-length on-device scan emits
up to ``max_tokens`` (30, like the reference's text decoder clip,
reference: src/data/text_decoder.py Decoder) tokens per image; EOS handling
happens host-side after the single fetch.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from bdm_db1_tpu.core.vocab import VocabLayout
from bdm_db1_tpu.models.transformer_xl import TransformerXL

MAX_CAPTION_TOKENS = 30


def _generate_fn(model, max_tokens, variables, prompt, images, text, bias):
    logits, cache = model.apply(
        variables, prompt, images, text,
        model.apply(variables, prompt.shape[0],
                    method=TransformerXL.init_kv_cache),
        method=TransformerXL.prime_ic_kv)
    tok0 = jnp.argmax(logits + bias, axis=-1).astype(jnp.int32)

    def body(carry, _):
        tok, cache = carry
        lg, cache = model.apply(variables, tok[:, None], cache,
                                method=TransformerXL.decode_text_kv)
        nxt = jnp.argmax(lg + bias, axis=-1).astype(jnp.int32)
        return (nxt, cache), nxt

    (_, _), rest = jax.lax.scan(
        body, (tok0, cache), None, length=max_tokens - 1)
    return jnp.concatenate([tok0[None], rest], axis=0).T  # [B, max_tokens]


class CaptionGenerator:
    def __init__(self, model: TransformerXL, params, layout: VocabLayout,
                 eos_token_id: int, max_tokens: int = MAX_CAPTION_TOKENS):
        self.model = model
        self.params = params
        self.eos = eos_token_id
        self.max_tokens = max_tokens
        # text-only decoding: ban non-text ids and the padding tail
        bias = np.zeros((layout.padded_vocab_size,), np.float32)
        bias[layout.text_vocab_size:] = -1e10
        self._bias = jnp.asarray(bias)
        self._jit = jax.jit(partial(_generate_fn, model, max_tokens))

    def generate(self, prompt: np.ndarray, images: np.ndarray,
                 text_prefix: np.ndarray) -> List[List[int]]:
        """prompt [B, P] int; images [B, H, W, C]; text_prefix [B, T]
        (the caption seed, usually empty/eos); returns per-row token lists
        clipped at EOS."""
        toks = np.asarray(self._jit(
            {"params": self.params}, jnp.asarray(prompt, jnp.int32),
            jnp.asarray(images, jnp.float32),
            jnp.asarray(text_prefix, jnp.int32), self._bias))
        out = []
        for row in toks:
            ids = []
            for t in row.tolist():
                if t == self.eos:
                    break
                ids.append(t)
            out.append(ids)
        return out


def evaluate_ic(model, params, dataset, layout: VocabLayout,
                eos_token_id: int, num_samples: int = 0,
                batch_size: int = 8) -> Dict[str, float]:
    """Generate captions for the dataset and score them
    (reference: train.py evaluate path + coco_eval.py:37-84)."""
    from bdm_db1_tpu.eval.metrics import evaluate_captions

    gen = CaptionGenerator(model, params, layout, eos_token_id)
    n = min(num_samples or len(dataset), len(dataset))
    results: Dict[int, Sequence] = {}
    gts: Dict[int, List[Sequence]] = {}
    i = 0
    while i < n:
        idxs = list(range(i, min(i + batch_size, n)))
        items = [dataset.dataset[j] for j in idxs]  # RandomCOCO items
        prompt = np.stack([it["prompt"] for it in items])
        images = np.stack([
            np.transpose(it["img"], (1, 2, 0)) for it in items])
        seed = np.full((len(items), 1), eos_token_id, np.int32)
        caps = gen.generate(prompt, images, seed)
        for it, cap in zip(items, caps):
            img_id = int(it["img_id"])
            results[img_id] = cap
            anns = dataset.dataset.coco.img_to_anns[img_id]
            gts[img_id] = [list(a["caption"]) for a in anns]
        i += batch_size
    return evaluate_captions(results, gts)
