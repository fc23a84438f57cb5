"""Model-side utilities: init factories and stochastic depth.

Counterpart of reference src/model/utils.py: ``init_normal``/``init_scaled``
factories (:50-66) and ``DropPath`` (:108-127). The gelu variants live in
models/activations.py; the NaN scanner in utils/debugging.py.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def init_normal(sigma: float = 0.02):
    return nn.initializers.normal(stddev=sigma)


def init_scaled_normal(sigma: float, num_layers: int):
    """Megatron-style output-layer init: sigma / sqrt(2 * n_layers)."""
    return nn.initializers.normal(stddev=sigma / (2.0 * num_layers) ** 0.5)


class DropPath(nn.Module):
    """Stochastic depth: drop the whole residual branch per sample
    (reference: model/utils.py:108-127)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True
                 ) -> jnp.ndarray:
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)
