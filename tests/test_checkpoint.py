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


def test_invert_state_dict_roundtrip():
    """convert_state_dict and invert_state_dict are exact inverses over
    the reference's full parameter set (incl. the vision tower), so a
    synthesized DeepSpeed checkpoint at any geometry is faithful
    (scripts/ckpt_rehearsal.py uses this at 1.2B)."""
    import torch

    from bdm_db1_tpu.train.convert import convert_state_dict, invert_state_dict
    from torch_oracle import OracleTXL

    cfg = db1_tiny()
    cfg.model.dtype = "float32"
    torch.manual_seed(0)
    oracle = OracleTXL(cfg.model, cfg.vocab, cfg.vision).eval()
    with torch.no_grad():
        for p in oracle.parameters():
            p.normal_(0.0, 0.05)
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in oracle.state_dict().items()}
    params = convert_state_dict(sd, cfg)
    sd2 = invert_state_dict(params, cfg)
    missing = set(sd) - set(sd2)
    assert not missing, f"inverse lost keys: {sorted(missing)[:8]}"
    for k, v in sd2.items():
        # exact for parameters; the inv_freq buffer is recomputed
        # analytically (float rounding only)
        tol = dict(rtol=1e-6, atol=0) if k == "pos_emb.inv_freq" \
            else dict(rtol=0, atol=0)
        np.testing.assert_allclose(v, sd[k], err_msg=k, **tol)


def test_synthesized_deepspeed_cold_path(tmp_path):
    """save_deepspeed_checkpoint -> find/convert/load -> decode: the cold
    path the eval CLI takes on a raw reference checkpoint dir
    (reference: evaluate_rl.py:509-511), on a synthesized fp16 file."""
    from bdm_db1_tpu.train.convert import (
        convert_checkpoint, save_deepspeed_checkpoint,
    )

    cfg = db1_tiny()
    cfg.model.dtype = "float32"
    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    L = cfg.model.n_position
    toks = jnp.zeros((1, L), jnp.int32)
    from bdm_db1_tpu.data.input_specs import RLTaskBatch

    batch = {"rl": RLTaskBatch(tokens=toks, position_id=toks,
                               loss_mask=toks, label=toks)}
    from flax import linen as nn

    params = nn.meta.unbox(model.init(jax.random.PRNGKey(7), batch)["params"])
    path = save_deepspeed_checkpoint(params, cfg, str(tmp_path), "synth")
    assert path.endswith("mp_rank_00_model_states.pt")
    restored = convert_checkpoint(str(tmp_path), "synth", cfg)
    # fp16 round trip: exact for values representable in fp16
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    restored_flat = dict(jax.tree_util.tree_leaves_with_path(restored))
    n_checked = 0
    n_vocab = cfg.vocab.layout().total_vocab_size
    for k, a in flat_a:
        if k not in restored_flat:
            continue  # vision tower absent when params lack -1 slots
        a = np.asarray(a, np.float32)
        b = restored_flat[k]
        if "word_embedding" in str(k):
            # pad rows above total_vocab_size are never read; convert
            # re-pads them with zeros while init drew random values
            a, b = a[:n_vocab], b[:n_vocab]
        np.testing.assert_allclose(a, b, rtol=1e-2, atol=1e-3,
                                   err_msg=str(k))
        n_checked += 1
    assert n_checked >= 10
    logits, _ = model.apply(
        {"params": jax.tree.map(jnp.asarray, restored)}, batch)
    assert np.isfinite(np.asarray(logits)).all()
