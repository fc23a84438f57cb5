"""Autoregressive text generation over the K/V cache.

The reference ships no LM sampling path (its text decoding is the greedy
caption printer, reference: src/data/text_decoder.py). This provides a
production-style generator for the language-modeling capability: one device
program folds the prompt into the cache and emits ``max_tokens`` with
greedy / temperature / top-k decoding; EOS clipping happens host-side after
a single fetch.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from bdm_db1_tpu.core.vocab import VocabLayout
from bdm_db1_tpu.models.transformer_xl import TransformerXL


def _sample(logits, rng, temperature: float, top_k: int, top_p: float):
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -1e30, logits)
    if 0.0 < top_p < 1.0:
        # nucleus filtering: keep the smallest set of tokens whose
        # cumulative probability exceeds top_p
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits / temperature, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # threshold logit: last one inside the nucleus
        inside = cum - probs < top_p
        cutoff = jnp.min(
            jnp.where(inside, sorted_logits, jnp.inf), axis=-1, keepdims=True)
        logits = jnp.where(logits < cutoff, -1e30, logits)
    return jax.random.categorical(
        rng, logits / temperature, axis=-1).astype(jnp.int32)


def _generate(model, max_tokens, temperature, top_k, top_p, variables,
              tokens, bias, rng):
    logits, cache = model.apply(
        variables, tokens,
        model.apply(variables, tokens.shape[0],
                    method=TransformerXL.init_kv_cache),
        method=TransformerXL.decode_text_kv)
    rngs = jax.random.split(rng, max_tokens)
    tok0 = _sample(logits + bias, rngs[0], temperature, top_k, top_p)

    def body(carry, r):
        tok, cache = carry
        lg, cache = model.apply(variables, tok[:, None], cache,
                                method=TransformerXL.decode_text_kv)
        nxt = _sample(lg + bias, r, temperature, top_k, top_p)
        return (nxt, cache), nxt

    (_, _), rest = jax.lax.scan(body, (tok0, cache), rngs[1:])
    return jnp.concatenate([tok0[None], rest], axis=0).T


class TextGenerator:
    """Batched LM generation: prompts -> continuations."""

    def __init__(self, model: TransformerXL, params, layout: VocabLayout,
                 eos_token_id: int, *, max_tokens: int = 64,
                 temperature: float = 0.0, top_k: int = 0,
                 top_p: float = 0.0):
        assert not model.cfg.pre_lnorm, "KV generation needs post-LN"
        self.model = model
        self.params = params
        self.eos = eos_token_id
        self.max_tokens = max_tokens
        bias = np.zeros((layout.padded_vocab_size,), np.float32)
        bias[layout.text_vocab_size:] = -1e10  # text ids only
        self._bias = jnp.asarray(bias)
        self._jit = jax.jit(
            partial(_generate, model, max_tokens, temperature, top_k, top_p))

    def generate(self, prompts: np.ndarray,
                 rng: Optional[jax.Array] = None) -> List[List[int]]:
        """prompts: [B, P] int token ids (pad with EOS to a common length).
        Returns per-row continuations clipped at EOS."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        toks = np.asarray(self._jit(
            {"params": self.params}, jnp.asarray(prompts, jnp.int32),
            self._bias, rng))
        out = []
        for row in toks:
            ids = []
            for t in row.tolist():
                if t == self.eos:
                    break
                ids.append(t)
            out.append(ids)
        return out

    def generate_text(self, tokenizer, texts: Sequence[str],
                      rng: Optional[jax.Array] = None) -> List[str]:
        enc = [tokenizer.encode(t) for t in texts]
        width = max(len(e) for e in enc)
        prompts = np.full((len(enc), width), self.eos, np.int32)
        for i, e in enumerate(enc):
            prompts[i, : len(e)] = e
        return [tokenizer.decode(ids)
                for ids in self.generate(prompts, rng=rng)]
