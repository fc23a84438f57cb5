"""Relative-position multi-head attention, pure-XLA path.

TransformerXL attention with the content/position score decomposition
(reference: src/model/transformer_xl.py:98-110, 160-220):

    AC[b,h,i,j] = (q + r_w_bias) . k        (content)
    BD[b,h,i,j] = rel_shift((q + r_r_bias) . r)   (position)

Scores, masking and softmax run in fp32 for parity with the fp16 reference
checkpoint; the probability-value matmul runs in the compute dtype (bf16 on
TPU) to stay on the MXU. A fused Pallas kernel lives in
``bdm_db1_tpu.ops.pallas_attention``; this module is the reference
implementation it is tested against and the fallback for odd shapes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

MASK_VALUE = -1e30


def rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """The TransformerXL zero-pad shift on [B, H, q, k] scores.

    Implements the same index remap as the reference's pad/view trick
    (reference: src/model/transformer_xl.py:98-110): after the shift,
    ``out[b,h,i,j]`` holds the score of query i against relative distance
    ``(k-1-j) - ...`` aligned so column j corresponds to absolute key j.
    """
    b, h, q, k = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(b, h, k + 1, q)
    x = x[:, :, 1:, :]
    return x.reshape(b, h, q, k)


def rel_shift_sliced(x: jnp.ndarray) -> jnp.ndarray:
    """rel_shift as per-row static slices: ``out[i, j] = x[i, j + q-1-i]``,
    zeros where that index runs past k.

    Identical to :func:`rel_shift` on every causally-valid position (row i,
    columns j <= mlen+i); the trailing always-masked columns hold zeros
    instead of rel_shift's wrapped junk. The pad/reshape trick's merged-dim
    reshapes lower to physical transposes on TPU (T(8,128) tiling with the
    small q dim minor — xprof showed ~31 ms/step of them in the 1.2B
    batch-24 decode prime); row slices + one stack stay in layout. Only
    sensible for small q (the stack unrolls q slices)."""
    b, h, q, k = x.shape
    if q == 1:
        return x
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, q - 1)))
    rows = [
        jax.lax.slice_in_dim(xp[:, :, i, :], q - 1 - i, q - 1 - i + k,
                             axis=-1)
        for i in range(q)
    ]
    return jnp.stack(rows, axis=2)


def causal_mask(qlen: int, klen: int, dtype=jnp.bool_) -> jnp.ndarray:
    """[q, k] boolean mask, True = banned. Plain causal with memory prefix
    (reference: src/model/transformer_xl.py:563-567)."""
    mlen = klen - qlen
    i = jnp.arange(qlen)[:, None]
    j = jnp.arange(klen)[None, :]
    return (j > i + mlen).astype(dtype)


def same_length_mask(
    qlen: int, klen: int, mem_len: int, dtype=jnp.bool_
) -> jnp.ndarray:
    """Sliding-window mask so each query sees exactly ``mem_len`` keys
    (reference: src/model/transformer_xl.py:551-562)."""
    mlen = klen - qlen
    i = jnp.arange(qlen)[:, None]
    j = jnp.arange(klen)[None, :]
    upper = j > i + mlen  # triu(1 + mlen)
    mask_len = klen - mem_len
    mask_shift_len = qlen - mask_len if mask_len > 0 else qlen
    lower = j < i - (mask_shift_len - 1)  # tril(-mask_shift_len)
    return (upper | lower).astype(dtype)


def rel_attention(
    q: jnp.ndarray,        # [B, qlen, H, Dh]
    k: jnp.ndarray,        # [B, klen, H, Dh]
    v: jnp.ndarray,        # [B, klen, H, Dh]
    r: jnp.ndarray,        # [klen, H, Dh]  projected positional embeddings
    r_w_bias: jnp.ndarray, # [H, Dh]
    r_r_bias: jnp.ndarray, # [H, Dh]
    mask: Optional[jnp.ndarray],  # [q, k] or [B, q, k] bool, True = banned
    *,
    scale: Optional[float] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Returns [B, qlen, H, Dh]."""
    d_head = q.shape[-1]
    if scale is None:
        scale = 1.0 / (d_head ** 0.5)

    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    rf = r.astype(jnp.float32)

    rw_q = qf + r_w_bias.astype(jnp.float32)
    rr_q = qf + r_r_bias.astype(jnp.float32)

    # [B, H, q, k] in fp32 (parity-critical: reference computes fp32 einsums,
    # reference: src/model/transformer_xl.py:163-174)
    ac = jnp.einsum("bihd,bjhd->bhij", rw_q, kf)
    bd = jnp.einsum("bihd,jhd->bhij", rr_q, rf)
    bd = rel_shift(bd)
    scores = (ac + bd) * scale

    if mask is not None:
        if mask.ndim == 2:
            mask = mask[None, None, :, :]
        elif mask.ndim == 3:
            mask = mask[:, None, :, :]
        scores = jnp.where(mask, MASK_VALUE, scores)

    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)

    probs = probs.astype(compute_dtype)
    out = jnp.einsum("bhij,bjhd->bihd", probs, v.astype(compute_dtype))
    return out
