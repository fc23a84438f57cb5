"""Sharded training-step tests on the 8-virtual-device CPU mesh: DP+TP
shardings compile and execute, loss decreases, schedules behave."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bdm_db1_tpu.core.config import OptimizerConfig, db1_tiny
from bdm_db1_tpu.core.vocab import VocabLayout
from bdm_db1_tpu.data.input_specs import NLPTaskBatch
from bdm_db1_tpu.models.transformer_xl import TransformerXL
from bdm_db1_tpu.parallel.mesh import make_mesh
from bdm_db1_tpu.train.schedule import lr_schedule
from bdm_db1_tpu.train.step import (
    init_train_state,
    make_optimizer,
    make_sharded_train_step,
    make_train_step,
)


def _tiny_batch(layout: VocabLayout, accum=2, micro=4, L=64, seed=0):
    rng = np.random.RandomState(seed)
    toks = rng.randint(1, layout.total_vocab_size, (accum, micro, L))
    # learnable pattern: constant sequences
    toks[..., :] = toks[..., :1]
    return {"nlp": NLPTaskBatch(
        tokens=jnp.asarray(toks, jnp.int32),
        loss_mask=jnp.ones((accum, micro, L), jnp.float32),
        label=jnp.asarray(toks, jnp.int32))}


def test_lr_schedule_shapes():
    cfg = OptimizerConfig(lr=1e-3, min_lr=1e-4, lr_warmup_iters=10,
                          lr_decay_style="cosine")
    s = lr_schedule(cfg, 100)
    assert float(s(0)) == 0.0
    assert abs(float(s(5)) - 5e-4) < 1e-9          # linear warmup
    assert abs(float(s(10)) - 1e-3) < 1e-9
    assert abs(float(s(100)) - 1e-4) < 1e-9        # decayed to min
    mid = float(s(55))
    assert 1e-4 < mid < 1e-3


def test_single_device_train_step_loss_decreases():
    cfg = db1_tiny()
    cfg.model.dtype = "float32"
    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    layout = cfg.vocab.layout()
    batch = _tiny_batch(layout)
    tx = make_optimizer(OptimizerConfig(lr=1e-2, lr_decay_style="constant",
                                        clip_grad=1.0), 100)
    state = init_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = jax.jit(make_train_step(model, tx))
    losses = []
    rng = jax.random.PRNGKey(1)
    for i in range(8):
        state, m = step(state, batch, rng)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses
    assert int(state.step) == 8


def test_fused_adamw_matches_chain():
    """fused_adamw (one tree_map, f32 leaf math) == the 4-stage optax chain
    on f32 params: same params after several steps, including warmup (lr=0
    step), clipping (first grads exceed the tiny clip), weight decay on
    matrices, and the cosine schedule."""
    cfg = db1_tiny()
    cfg.model.dtype = "float32"
    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    layout = cfg.vocab.layout()
    batch = _tiny_batch(layout)
    ocfg = OptimizerConfig(lr=1e-2, min_lr=1e-3, lr_warmup_iters=2,
                           lr_decay_style="cosine", clip_grad=0.05,
                           weight_decay=0.1)
    import dataclasses

    tx_chain = make_optimizer(ocfg, 10)
    tx_fused = make_optimizer(dataclasses.replace(ocfg, fused=True), 10)

    state_c = init_train_state(model, tx_chain, jax.random.PRNGKey(0), batch)
    state_f = init_train_state(model, tx_fused, jax.random.PRNGKey(0), batch)
    step_c = jax.jit(make_train_step(model, tx_chain))
    step_f = jax.jit(make_train_step(model, tx_fused))
    rng = jax.random.PRNGKey(1)
    for i in range(5):
        state_c, m_c = step_c(state_c, batch, rng)
        state_f, m_f = step_f(state_f, batch, rng)
    pc = jax.tree.leaves(state_c.params)
    pf = jax.tree.leaves(state_f.params)
    for a, b in zip(pc, pf):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-6)
    # moments carried too (fused state is one ScaleByAdamState)
    assert int(state_f.opt_state.count) == 5


def test_train_step_with_rbg_rng():
    """The default training rng impl ("rbg" — TPU hardware RngBitGenerator,
    ~16% of the 1.2B step vs threefry masks) must drive the train step on
    every backend; make_train_rng falls back to threefry when unavailable."""
    from bdm_db1_tpu.train.step import make_train_rng

    cfg = db1_tiny()
    cfg.model.dtype = "float32"
    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    layout = cfg.vocab.layout()
    batch = _tiny_batch(layout)
    tx = make_optimizer(OptimizerConfig(lr=1e-2), 100)
    state = init_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = jax.jit(make_train_step(model, tx))
    state, m = step(state, batch, make_train_rng(1, "rbg"))
    assert np.isfinite(float(m["loss"]))
    # unknown impl -> threefry fallback, not a crash
    state, m = step(state, batch, make_train_rng(1, "no-such-impl"))
    assert np.isfinite(float(m["loss"]))


@pytest.mark.parametrize("tp", [1, 2])
def test_sharded_train_step_dp_tp(tp):
    cfg = db1_tiny()
    cfg.model.dtype = "float32"
    cfg.mesh.model_parallel = tp
    mesh = make_mesh(cfg.mesh)
    assert mesh.devices.size == 8

    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    layout = cfg.vocab.layout()
    batch = _tiny_batch(layout, accum=2, micro=8)
    tx = make_optimizer(OptimizerConfig(lr=1e-2), 100)
    init_fn, step_fn = make_sharded_train_step(
        model, tx, jax.random.PRNGKey(0), batch, mesh)
    state = init_fn(batch)
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # TP actually shards the qkv kernel over the model axis
    qkv = state.params["layers"]["attn"]["qkv_net"]["kernel"]
    qkv_val = qkv.value if hasattr(qkv, "value") else qkv
    if tp > 1:
        spec = tuple(qkv_val.sharding.spec)
        assert "model" in spec, spec


def test_dp_tp_losses_agree():
    """The same step on (8,1) and (4,2) meshes gives the same loss."""
    cfg = db1_tiny()
    cfg.model.dtype = "float32"
    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    layout = cfg.vocab.layout()
    batch = _tiny_batch(layout, accum=1, micro=8)
    tx = make_optimizer(
        OptimizerConfig(lr=1e-2, lr_decay_style="constant"), 100)

    losses = {}
    for tp in (1, 2):
        cfg.mesh.model_parallel = tp
        mesh = make_mesh(cfg.mesh)
        init_fn, step_fn = make_sharded_train_step(
            model, tx, jax.random.PRNGKey(0), batch, mesh)
        state = init_fn(batch)
        _, m1 = step_fn(state, batch, jax.random.PRNGKey(1))
        losses[tp] = float(m1["loss"])
    assert abs(losses[1] - losses[2]) < 1e-3, losses


def test_sequence_sharded_activations_matches():
    """Megatron-SP activation sharding changes layout, not math."""
    cfg = db1_tiny()
    cfg.model.dtype = "float32"
    layout = cfg.vocab.layout()
    batch = _tiny_batch(layout, accum=1, micro=8)
    tx = make_optimizer(
        OptimizerConfig(lr=1e-2, lr_decay_style="constant"), 100)

    losses = {}
    for sp in (False, True):
        cfg.mesh.model_parallel = 2
        cfg.model.sequence_sharded_activations = sp
        model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
        mesh = make_mesh(cfg.mesh)
        init_fn, step_fn = make_sharded_train_step(
            model, tx, jax.random.PRNGKey(0), batch, mesh)
        state = init_fn(batch)
        _, m = step_fn(state, batch, jax.random.PRNGKey(1))
        losses[sp] = float(m["loss"])
    cfg.model.sequence_sharded_activations = False
    assert abs(losses[False] - losses[True]) < 1e-3, losses


def test_adam_nu_dtype_matches_optax():
    """_scale_by_adam_nu with f32 storage == the optax scale_by_adam chain
    (same params after several steps); bf16 nu storage stays close and
    still trains (loss decreases) — the HBM-halving mode is a rounding
    perturbation, not a different update rule."""
    import dataclasses

    cfg = db1_tiny()
    cfg.model.dtype = "float32"
    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    layout = cfg.vocab.layout()
    batch = _tiny_batch(layout)
    ocfg = OptimizerConfig(lr=1e-2, min_lr=1e-3, lr_warmup_iters=1,
                           lr_decay_style="cosine", clip_grad=0.5,
                           weight_decay=0.1)

    def run(o):
        tx = make_optimizer(o, 10)
        state = init_train_state(model, tx, jax.random.PRNGKey(0), batch)
        step = jax.jit(make_train_step(model, tx))
        rng = jax.random.PRNGKey(1)
        losses = []
        for _ in range(5):
            state, m = step(state, batch, rng)
            losses.append(float(m["loss"]))
        return state, losses

    s_ref, _ = run(ocfg)
    s_f32, _ = run(dataclasses.replace(ocfg, adam_nu_dtype="float32"))
    for a, b in zip(jax.tree.leaves(s_ref.params),
                    jax.tree.leaves(s_f32.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-6)

    s_bf, losses_bf = run(dataclasses.replace(ocfg, adam_nu_dtype="bfloat16"))
    assert losses_bf[-1] < losses_bf[0]
    for a, b in zip(jax.tree.leaves(s_ref.params),
                    jax.tree.leaves(s_bf.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0.1, atol=5e-3)
