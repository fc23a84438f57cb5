"""Fused blockwise CE (ops/fused_ce.py) vs the reference fp32 log_softmax
path: loss and gradients must agree."""

import jax
import jax.numpy as jnp
import numpy as np

from bdm_db1_tpu.core.config import db1_tiny
from bdm_db1_tpu.data.input_specs import RLTaskBatch
from bdm_db1_tpu.models.transformer_xl import (
    TransformerXL, masked_cross_entropy,
)
from bdm_db1_tpu.ops.fused_ce import _pick_block, masked_cross_entropy_fused


def _ref_loss(h, emb, labels, mask, valid):
    logits = jnp.einsum("bld,vd->blv", h, emb).astype(jnp.float32)
    return masked_cross_entropy(logits, labels, mask, valid)


def test_fused_matches_reference_loss_and_grads():
    rng = np.random.RandomState(0)
    B, L, D, V, valid = 2, 16, 32, 384, 300
    h = jnp.asarray(rng.randn(B, L, D), jnp.float32)
    emb = jnp.asarray(rng.randn(V, D) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.randint(0, valid, (B, L)), jnp.int32)
    mask = jnp.asarray((rng.rand(B, L) < 0.4), jnp.float32)

    ref, (dh_r, de_r) = jax.value_and_grad(_ref_loss, argnums=(0, 1))(
        h, emb, labels, mask, valid)
    fused, (dh_f, de_f) = jax.value_and_grad(
        masked_cross_entropy_fused, argnums=(0, 1))(
        h, emb, labels, mask, valid)

    np.testing.assert_allclose(float(ref), float(fused), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dh_f), np.asarray(dh_r),
                               atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(de_f), np.asarray(de_r),
                               atol=1e-6, rtol=1e-5)


def test_fused_all_masked_positions():
    rng = np.random.RandomState(1)
    h = jnp.asarray(rng.randn(1, 8, 16), jnp.float32)
    emb = jnp.asarray(rng.randn(128, 16), jnp.float32)
    labels = jnp.zeros((1, 8), jnp.int32)
    mask = jnp.zeros((1, 8), jnp.float32)
    loss = masked_cross_entropy_fused(h, emb, labels, mask, 100)
    assert float(loss) == 0.0


def test_pick_block_divides():
    for v in (33152, 384, 128, 4736, 8192, 1024):
        b = _pick_block(v)
        assert v % b == 0 and b <= 8192


def test_model_loss_only_matches_full_path():
    """model(..., loss_only=True) loss == the unfused (logits) loss, and
    the train-step gradient agrees — the flagship's hot path is exact."""
    cfg = db1_tiny()
    cfg.model.dtype = "float32"
    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    L = cfg.model.n_position
    rng = np.random.RandomState(2)
    layout = cfg.vocab.layout()
    tok = jnp.asarray(
        rng.randint(0, layout.total_vocab_size, (2, L)), jnp.int32)
    pos = jnp.asarray(rng.randint(0, 8, (2, L)), jnp.int32)
    msk = jnp.asarray((rng.rand(2, L) < 0.3), jnp.float32)
    batch = {"rl": RLTaskBatch(tokens=tok, position_id=pos,
                               loss_mask=msk, label=tok)}
    params = model.init(jax.random.PRNGKey(0), batch)["params"]

    def loss_full(p):
        _, loss = model.apply({"params": p}, batch)
        return loss

    def loss_fused(p):
        _, loss = model.apply({"params": p}, batch, loss_only=True)
        return loss

    l_full, g_full = jax.value_and_grad(loss_full)(params)
    l_fused, g_fused = jax.value_and_grad(loss_fused)(params)
    np.testing.assert_allclose(float(l_full), float(l_fused), rtol=1e-6)
    flat_full = jax.tree.leaves(g_full)
    flat_fused = jax.tree.leaves(g_fused)
    for a, b in zip(flat_full, flat_fused):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5, rtol=1e-4)
