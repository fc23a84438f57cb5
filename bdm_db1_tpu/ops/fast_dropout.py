"""Byte-granular dropout: 4x fewer random bits than flax's nn.Dropout.

Motivation (r3->r4 MFU work): with hardware-RBG keys the 1.2B train step
still pays ~2.3% for dropout (12,789 tok/s vs 13,087 dropout-zeroed,
PERFORMANCE.md) — and the mask bits are generated TWICE per step (forward
+ remat recompute). ``nn.Dropout`` draws one uint32 per element
(``random.bernoulli`` -> ``random.uniform`` -> float compare); dropout
rates have no business being finer-grained than 1/256, so this module
draws a quarter-sized uint32 tensor, bitcasts it to uint8 lanes, and
compares bytes on the VPU's int8 lanes instead.

Semantics: keep probability is quantized to ``round((1-rate)*256)/256``
(e.g. rate 0.1 -> keep 230/256 = 0.8984) and the survivors are rescaled by
the TRUE quantized keep probability, so the op stays unbiased
(E[out] == x) — the regularization strength just moves by <0.2%. The
reference applies torch's float-granular dropout at the same sites
(reference: src/model/transformer_xl.py Dropout modules); parity of the
*deterministic* path is untouched — dropout is identity at eval.

Determinism: bits are a pure function of the key, so the remat backward
recompute regenerates the identical mask, exactly like nn.Dropout.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def dropout_u8(x: jax.Array, rate: float, key: jax.Array) -> jax.Array:
    """Apply dropout with byte-granular keep probability.

    Draws ceil(size/4) uint32s (4x fewer PRNG bits than bernoulli) and
    keeps element i iff its byte < round((1-rate)*256).
    """
    keep_q = int(round((1.0 - rate) * 256.0))
    if keep_q >= 256:
        return x
    if keep_q <= 0:
        return jnp.zeros_like(x)
    n = x.size
    n32 = -(-n // 4)
    bits32 = jax.random.bits(key, (n32,), jnp.uint32)
    b8 = jax.lax.bitcast_convert_type(bits32, jnp.uint8).reshape(-1)
    if b8.size != n:
        b8 = b8[:n]
    keep = (b8 < jnp.uint8(keep_q)).reshape(x.shape)
    scale = jnp.asarray(256.0 / keep_q, x.dtype)
    return jnp.where(keep, x * scale, jnp.zeros((), x.dtype))


class DropoutU8(nn.Module):
    """Drop-in replacement for ``nn.Dropout`` (same rng collection and
    ``deterministic`` contract) backed by :func:`dropout_u8`."""

    rate: float
    rng_collection: str = "dropout"

    @nn.compact
    def __call__(self, x: jax.Array, *,
                 deterministic: bool = False) -> jax.Array:
        if deterministic or self.rate == 0.0:
            return x
        return dropout_u8(x, self.rate, self.make_rng(self.rng_collection))
