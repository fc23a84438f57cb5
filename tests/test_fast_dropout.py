"""Byte-granular dropout (ops/fast_dropout.py): statistics + determinism.

The op exists to close the measured ~2.3% train-step dropout cost
(PERFORMANCE.md): nn.Dropout draws one uint32 per element; dropout_u8
draws a quarter as many and compares uint8 lanes. These tests pin the
semantics that make it a safe swap: unbiasedness under the QUANTIZED keep
probability, the advertised keep rate, remat-style determinism (same key
-> same mask), and the flax-module contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bdm_db1_tpu.ops.fast_dropout import DropoutU8, dropout_u8


def test_keep_rate_and_scale():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((64, 1024), jnp.float32)
    rate = 0.1
    y = dropout_u8(x, rate, key)
    keep_q = round((1 - rate) * 256) / 256  # 230/256
    kept = float((y != 0).mean())
    assert abs(kept - keep_q) < 0.01, (kept, keep_q)
    # survivors are rescaled by the true quantized keep prob -> unbiased
    np.testing.assert_allclose(float(y.max()), 256 / 230, rtol=1e-6)
    np.testing.assert_allclose(float(y.mean()), 1.0, atol=0.02)


def test_rate_zero_and_one():
    key = jax.random.PRNGKey(1)
    x = jnp.arange(12.0).reshape(3, 4)
    np.testing.assert_array_equal(np.asarray(dropout_u8(x, 0.0, key)),
                                  np.asarray(x))
    assert float(jnp.abs(dropout_u8(x, 1.0, key)).sum()) == 0.0


def test_deterministic_given_key():
    """Remat recomputes the mask from the same key — bit-identical, like
    nn.Dropout (the property the backward pass relies on)."""
    key = jax.random.PRNGKey(2)
    x = jnp.asarray(np.random.RandomState(0).randn(33, 7, 5),
                    jnp.float32)  # odd size: exercises the [:n] slice
    y1 = jax.jit(lambda: dropout_u8(x, 0.25, key))()
    y2 = jax.jit(lambda: dropout_u8(x, 0.25, key))()
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_bf16_dtype_preserved():
    y = dropout_u8(jnp.ones((8, 128), jnp.bfloat16), 0.1,
                   jax.random.PRNGKey(3))
    assert y.dtype == jnp.bfloat16


def test_module_contract():
    """DropoutU8 honors deterministic=True and the 'dropout' rng
    collection, like nn.Dropout."""
    mod = DropoutU8(0.5)
    x = jnp.ones((4, 16))
    y_det = mod.apply({}, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(y_det), np.asarray(x))
    y = mod.apply({}, x, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(4)})
    kept = float((y != 0).mean())
    assert 0.3 < kept < 0.7, kept
    with pytest.raises(Exception):
        mod.apply({}, x, deterministic=False)  # missing rng must raise


def test_model_knob_trains():
    """ModelConfig.dropout_impl='u8' swaps every train-path dropout; the
    loss must stay finite and differ from the deterministic path (masks
    really apply)."""
    from bdm_db1_tpu.core.config import db1_tiny
    from bdm_db1_tpu.data.input_specs import RLTaskBatch
    from bdm_db1_tpu.models.transformer_xl import TransformerXL

    cfg = db1_tiny()
    cfg.model.dtype = "float32"
    cfg.model.dropout_impl = "u8"
    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    L = cfg.model.n_position
    tok = jnp.ones((1, L), jnp.int32)
    batch = {"rl": RLTaskBatch(tokens=tok, position_id=tok,
                               loss_mask=jnp.ones_like(tok, jnp.float32),
                               label=tok)}
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    _, loss_det = model.apply({"params": params}, batch,
                              deterministic=True)
    _, loss_drop = model.apply(
        {"params": params}, batch, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(5)})
    assert np.isfinite(float(loss_drop))
    assert float(loss_det) != float(loss_drop)
