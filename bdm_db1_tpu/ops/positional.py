"""Sinusoidal relative positional embeddings (TransformerXL style).

Matches the reference (reference: src/model/transformer_xl.py:34-50, 569-575):
``inv_freq = 1/10000^(2i/d)`` over a *descending* position sequence
``[klen-1, ..., 0]`` clamped at ``clamp_len``; embedding is
``concat(sin, cos)`` along the feature axis.
"""

from __future__ import annotations

import jax.numpy as jnp


def relative_positional_embedding(
    klen: int, d_model: int, clamp_len: int, dtype=jnp.float32
) -> jnp.ndarray:
    """Returns [klen, d_model]; row 0 is the most distant position."""
    inv_freq = 1.0 / (
        10000.0 ** (jnp.arange(0, d_model, 2, dtype=jnp.float32) / d_model)
    )
    pos_seq = jnp.arange(klen - 1, -1, -1, dtype=jnp.float32)
    if clamp_len > 0:
        pos_seq = jnp.minimum(pos_seq, float(clamp_len))
    sinusoid = pos_seq[:, None] * inv_freq[None, :]
    emb = jnp.concatenate([jnp.sin(sinusoid), jnp.cos(sinusoid)], axis=-1)
    return emb.astype(dtype)
