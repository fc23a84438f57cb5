"""Activation registry (reference: src/model/activations.py:19-32,
src/model/utils.py:22-28, 83-105).

``gelu`` is the exact erf form (torch ``nn.GELU`` default); ``gelu_new`` is
the tanh approximation. ``geglu`` halves the feature dim: ``a * gelu(b)``.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.nn import gelu as _jax_gelu


def gelu(x):
    return _jax_gelu(x, approximate=False)


def gelu_new(x):
    return _jax_gelu(x, approximate=True)


def geglu(x):
    a, b = jnp.split(x, 2, axis=-1)
    return a * gelu(b)


def relu(x):
    return jnp.maximum(x, 0)


def silu(x):
    import jax.nn

    return jax.nn.silu(x)


def tanh(x):
    return jnp.tanh(x)


ACT2FN = {
    "gelu": gelu,
    "gelu_new": gelu_new,
    "geglu": geglu,
    "relu": relu,
    "silu": silu,
    "tanh": tanh,
}


def ffn_output_dim_factor(activation: str) -> int:
    """geglu halves the inner width seen by the second projection
    (reference: src/model/transformer_xl.py:261-268)."""
    return 2 if activation == "geglu" else 1
