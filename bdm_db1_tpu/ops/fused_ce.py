"""Memory-efficient masked cross-entropy over the tied LM head.

The straightforward loss path (reference keeps fp32 loss math,
src/model/transformer_xl.py:602-611) materializes fp32 logits
[B, L, 33152] plus a log_softmax twin — ~1.1 GB of HBM traffic and
residuals per 1.2B micro-batch. This computes the same masked mean NLL
*blockwise over the vocab* with a custom VJP:

  forward:  scan over vocab chunks; per chunk one bf16 [N,D]x[D,block]
            MXU matmul with fp32 accumulation, a running (max, sumexp)
            pair and the label logit — nothing of size [N, V] survives.
  backward: recompute each chunk's logits from (h, emb, lse), form
            (softmax - onehot) * scale in registers, and emit the two
            grad matmuls (dh += dlogits @ W_c, dW_c = dlogits^T @ h).

Residuals are just h (already stored by the caller), the embedding and a
[N] fp32 logsumexp — the fp32 logits tensor never exists. The price is
one extra head matmul in the backward (the head is ~5% of forward
FLOPs), the payoff is ~1 GB of freed HBM per micro-batch, which buys a
larger micro batch / lighter remat elsewhere.

Numerics: matmuls run in bf16 with fp32 accumulation
(``preferred_element_type``); max/sumexp/NLL math is fp32 throughout, so
the result matches the unfused fp32 log_softmax path to ~1e-6 (tested in
tests/test_fused_ce.py against models.transformer_xl.masked_cross_entropy).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

NEG_INF = -1e30


def _pick_block(v: int, target: int = 8192) -> int:
    """Largest multiple-of-128 divisor of v that is <= target (v is already
    MXU-padded to a multiple of 128 by VocabLayout.padded_vocab_size)."""
    best = v
    for b in range(128, min(target, v) + 1, 128):
        if v % b == 0:
            best = b
    return best if best <= target else v


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def masked_ce_tied(h: Array, emb: Array, labels: Array, loss_mask: Array,
                   valid_vocab: int, block: int) -> Array:
    """Masked mean NLL of ``labels`` under softmax(h @ emb^T).

    h: [B, L, D] (any float dtype), emb: [V, D], labels: [B, L] int,
    loss_mask: [B, L]. ``valid_vocab`` masks the MXU padding tail out of
    the softmax; ``block`` must divide V.
    """
    lse, ll = _scan_lse(h, emb, labels, valid_vocab, block)
    nll = lse - ll
    mask = loss_mask.reshape(-1).astype(jnp.float32)
    return (nll * mask).sum() / jnp.maximum(mask.sum(), 1e-8)


def _chunk_cols(c: int, block: int) -> Array:
    return c * block + jnp.arange(block)


def _scan_lse(h, emb, labels, valid_vocab, block) -> Tuple[Array, Array]:
    """Blockwise (logsumexp, label-logit) over vocab chunks."""
    d = h.shape[-1]
    v = emb.shape[0]
    n_chunks = v // block
    h2 = h.reshape(-1, d)
    n = h2.shape[0]
    lab = labels.reshape(-1)
    w = emb.reshape(n_chunks, block, d)

    def body(carry, xs):
        m, s, ll = carry
        w_c, c = xs
        logits = jnp.dot(h2, w_c.T.astype(h2.dtype),
                         preferred_element_type=jnp.float32)
        cols = _chunk_cols(c, block)
        logits = jnp.where(cols[None, :] < valid_vocab, logits, NEG_INF)
        m_new = jnp.maximum(m, logits.max(axis=-1))
        s = s * jnp.exp(m - m_new) + jnp.exp(
            logits - m_new[:, None]).sum(axis=-1)
        local = lab - c * block
        in_chunk = (local >= 0) & (local < block)
        picked = jnp.take_along_axis(
            logits, jnp.clip(local, 0, block - 1)[:, None], axis=-1)[:, 0]
        ll = jnp.where(in_chunk, picked, ll)
        return (m_new, s, ll), None

    init = (jnp.full((n,), NEG_INF, jnp.float32),
            jnp.zeros((n,), jnp.float32),
            jnp.zeros((n,), jnp.float32))
    (m, s, ll), _ = jax.lax.scan(
        body, init, (w, jnp.arange(n_chunks)))
    return m + jnp.log(s), ll


def _fwd(h, emb, labels, loss_mask, valid_vocab, block):
    lse, ll = _scan_lse(h, emb, labels, valid_vocab, block)
    mask = loss_mask.reshape(-1).astype(jnp.float32)
    denom = jnp.maximum(mask.sum(), 1e-8)
    loss = ((lse - ll) * mask).sum() / denom
    return loss, (h, emb, labels, loss_mask, lse, denom)


def _bwd(valid_vocab, block, res, g):
    h, emb, labels, loss_mask, lse, denom = res
    d = h.shape[-1]
    v = emb.shape[0]
    n_chunks = v // block
    h2 = h.reshape(-1, d)
    lab = labels.reshape(-1)
    mask = loss_mask.reshape(-1).astype(jnp.float32)
    scale = (g * mask / denom)  # [N] fp32

    w = emb.reshape(n_chunks, block, d)

    def body(dh, xs):
        w_c, c = xs
        logits = jnp.dot(h2, w_c.T.astype(h2.dtype),
                         preferred_element_type=jnp.float32)
        cols = _chunk_cols(c, block)
        logits = jnp.where(cols[None, :] < valid_vocab, logits, NEG_INF)
        p = jnp.exp(logits - lse[:, None])
        local = lab - c * block
        onehot = (local[:, None] == jnp.arange(block)[None, :])
        dl = (p - onehot.astype(jnp.float32)) * scale[:, None]
        dl16 = dl.astype(h2.dtype)
        dh = dh + jnp.dot(dl16, w_c.astype(h2.dtype),
                          preferred_element_type=jnp.float32)
        dw_c = jnp.dot(dl16.T, h2, preferred_element_type=jnp.float32)
        return dh, dw_c

    dh0 = jnp.zeros(h2.shape, jnp.float32)
    dh, dw = jax.lax.scan(body, dh0, (w, jnp.arange(n_chunks)))
    d_labels = np.zeros(labels.shape, dtype=jax.dtypes.float0)
    return (dh.astype(h.dtype).reshape(h.shape),
            dw.reshape(v, d).astype(emb.dtype),
            d_labels,
            jnp.zeros_like(loss_mask))


masked_ce_tied.defvjp(_fwd, _bwd)


def masked_cross_entropy_fused(h: Array, emb: Array, labels: Array,
                               loss_mask: Array, valid_vocab: int) -> Array:
    """Entry point: picks the vocab block size and runs the custom-VJP CE."""
    block = _pick_block(emb.shape[0])
    return masked_ce_tied(h, emb, labels, loss_mask, valid_vocab, block)
