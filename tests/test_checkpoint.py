"""Orbax checkpoint save/restore roundtrip with client state (SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np

from bdm_db1_tpu.core.config import OptimizerConfig, db1_tiny
from bdm_db1_tpu.data.input_specs import NLPTaskBatch
from bdm_db1_tpu.models.transformer_xl import TransformerXL
from bdm_db1_tpu.train.checkpoint import CheckpointManager
from bdm_db1_tpu.train.step import (
    init_train_state,
    make_optimizer,
    make_train_step,
)


def _state_and_batch():
    cfg = db1_tiny()
    cfg.model.dtype = "float32"
    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    L = cfg.model.n_position
    toks = jnp.ones((1, 2, L), jnp.int32)
    batch = {"nlp": NLPTaskBatch(tokens=toks,
                                 loss_mask=jnp.ones_like(toks, jnp.float32),
                                 label=toks)}
    tx = make_optimizer(OptimizerConfig(lr=1e-3), 10)
    state = init_train_state(model, tx, jax.random.PRNGKey(0), batch)
    return model, tx, state, batch


def test_save_restore_roundtrip(tmp_path):
    model, tx, state, batch = _state_and_batch()
    step_fn = jax.jit(make_train_step(model, tx))
    state, _ = step_fn(state, batch, jax.random.PRNGKey(1))

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, state, client_state={"iteration": 1, "note": "test"})
    mgr.wait()
    assert mgr.latest_step() == 1

    template = jax.tree.map(np.zeros_like, state)
    restored, client = mgr.restore(template)
    assert client["iteration"] == 1
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    mgr.close()


def test_resume_continues_training(tmp_path):
    model, tx, state, batch = _state_and_batch()
    step_fn = jax.jit(make_train_step(model, tx))
    for _ in range(2):
        state, _ = step_fn(state, batch, jax.random.PRNGKey(1))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(2, state, client_state={"iteration": 2})
    mgr.wait()

    template = jax.tree.map(np.zeros_like, state)
    restored, client = mgr.restore(template)
    mgr.close()
    restored, m = step_fn(restored, batch, jax.random.PRNGKey(1))
    assert int(restored.step) == 3
    assert np.isfinite(float(m["loss"]))
