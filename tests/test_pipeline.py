"""GPipe pipeline parallelism on the 8-virtual-device CPU mesh: the
pipelined trunk is numerically the single-stage trunk, layer params shard
across stages, and the full sharded train step agrees with DP-only."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bdm_db1_tpu.core.config import OptimizerConfig, db1_tiny
from bdm_db1_tpu.data.input_specs import NLPTaskBatch
from bdm_db1_tpu.models.transformer_xl import TransformerXL
from bdm_db1_tpu.parallel.mesh import make_mesh
from bdm_db1_tpu.parallel.pipeline import pipeline_trunk
from bdm_db1_tpu.train.step import make_optimizer, make_sharded_train_step


def _cfg(n_layer=4, dropout=0.0):
    cfg = db1_tiny(n_layer=n_layer)
    cfg.model.dtype = "float32"
    # the pipeline folds dropout keys per (stage, layer, tick) rather than
    # via nn.scan's split_rngs, so exact-agreement tests run dropout-free
    cfg.model.drop = dropout
    cfg.model.embd_pdrop = dropout
    cfg.model.resid_pdrop = dropout
    return cfg


def _batch(layout, accum=1, micro=8, L=64, seed=0):
    rng = np.random.RandomState(seed)
    toks = rng.randint(1, layout.total_vocab_size, (accum, micro, L))
    return {"nlp": NLPTaskBatch(
        tokens=jnp.asarray(toks, jnp.int32),
        loss_mask=jnp.ones((accum, micro, L), jnp.float32),
        label=jnp.asarray(toks, jnp.int32))}


@pytest.mark.parametrize("pp,tp,n_micro", [(2, 1, 2), (2, 2, 4), (4, 1, 2)])
def test_pipeline_trunk_matches_single_stage(pp, tp, n_micro):
    cfg = _cfg()
    cfg.mesh.model_parallel = tp
    cfg.mesh.pipeline_parallel = pp
    mesh = make_mesh(cfg.mesh)
    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    layout = cfg.vocab.layout()
    batch = _batch(layout)
    micro = jax.tree.map(lambda x: x[0], batch)
    params = model.init(jax.random.PRNGKey(0), micro)["params"]

    h, _, _ = model.apply({"params": params}, micro, True,
                          method=TransformerXL.embed_concat,
                          with_targets=False)
    ref, _ = model.apply({"params": params}, h, None, True,
                         method=TransformerXL.trunk)
    out = pipeline_trunk(
        cfg.model, params["layers"],
        params.get("r_w_bias"), params.get("r_r_bias"),
        h, n_micro, mesh, deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipelined_step_matches_dp_and_shards_layers():
    """One train step on (4 data, 2 pipe, 1 model) and (2, 2, 2) meshes gives
    the DP-only loss, layer params shard over the pipe axis, and a second
    step still agrees (the update path is equivalent too)."""
    cfg = _cfg()
    layout = cfg.vocab.layout()
    batch = _batch(layout, accum=1, micro=8)
    tx = make_optimizer(
        OptimizerConfig(lr=1e-2, lr_decay_style="constant"), 100)
    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)

    losses = {}
    for dp, pp, tp in [(8, 1, 1), (4, 2, 1), (2, 2, 2)]:
        cfg.mesh.data_parallel = dp
        cfg.mesh.pipeline_parallel = pp
        cfg.mesh.model_parallel = tp
        mesh = make_mesh(cfg.mesh)
        init_fn, step_fn = make_sharded_train_step(
            model, tx, jax.random.PRNGKey(0), batch, mesh,
            pipeline_microbatches=4)
        state = init_fn(batch)
        state, m1 = step_fn(state, batch, jax.random.PRNGKey(1))
        state, m2 = step_fn(state, batch, jax.random.PRNGKey(1))
        losses[(dp, pp, tp)] = (float(m1["loss"]), float(m2["loss"]))
        if pp > 1:
            qkv = state.params["layers"]["attn"]["qkv_net"]["kernel"]
            qkv = qkv.value if hasattr(qkv, "value") else qkv
            assert tuple(qkv.sharding.spec)[0] == "pipe", qkv.sharding
    base = losses[(8, 1, 1)]
    for key, pair in losses.items():
        assert abs(pair[0] - base[0]) < 1e-3, losses
        assert abs(pair[1] - base[1]) < 1e-3, losses
    assert base[1] < base[0]  # it actually learns


def test_pipeline_dropout_distribution_matches_trunk():
    """Statistical check (VERDICT r2 next #8): the pipelined trunk's folded
    stage/layer/tick dropout keys produce the SAME output distribution as
    the single-stage trunk's nn.scan split_rngs dropout — per-element means
    over many rng draws agree within sampling error, and draws actually
    vary. embd_pdrop is zeroed so both paths apply only in-layer dropout."""
    cfg = _cfg(n_layer=2, dropout=0.2)
    cfg.model.embd_pdrop = 0.0
    cfg.mesh.data_parallel = 4
    cfg.mesh.pipeline_parallel = 2
    mesh = make_mesh(cfg.mesh)
    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    layout = cfg.vocab.layout()
    batch = _batch(layout, micro=4, L=16)
    micro = jax.tree.map(lambda x: x[0], batch)
    params = model.init(jax.random.PRNGKey(0), micro)["params"]
    h, _, _ = model.apply({"params": params}, micro, True,
                          method=TransformerXL.embed_concat,
                          with_targets=False)

    pipe_fn = jax.jit(lambda key: pipeline_trunk(
        cfg.model, params["layers"],
        params.get("r_w_bias"), params.get("r_r_bias"),
        h, 2, mesh, dropout_rng=key, deterministic=False))
    trunk_fn = jax.jit(lambda key: model.apply(
        {"params": params}, h, None, False,
        method=TransformerXL.trunk, rngs={"dropout": key})[0])

    N = 96
    pipe_samples = np.stack(
        [np.asarray(pipe_fn(jax.random.PRNGKey(1000 + i)))
         for i in range(N)])
    trunk_samples = np.stack(
        [np.asarray(trunk_fn(jax.random.PRNGKey(5000 + i)))
         for i in range(N)])
    # draws vary (masks are not degenerate / keys not constant)
    assert pipe_samples.std(axis=0).max() > 0
    assert not np.allclose(pipe_samples[0], pipe_samples[1])
    # per-element means agree within ~5 standard errors of the difference
    p_mean, t_mean = pipe_samples.mean(0), trunk_samples.mean(0)
    se = np.sqrt((pipe_samples.var(0) + trunk_samples.var(0)) / N)
    diff = np.abs(p_mean - t_mean)
    assert (diff <= 5 * se + 1e-4).mean() > 0.995, (
        diff.max(), (5 * se + 1e-4).max())
    # and the global moments line up
    np.testing.assert_allclose(p_mean.mean(), t_mean.mean(), atol=2e-3)
    np.testing.assert_allclose(pipe_samples.std(), trunk_samples.std(),
                               rtol=0.05)


def test_pipeline_dropout_keys_unique():
    """The folded (stage, layer, tick) -> key map must be collision-free
    over realistic pipeline extents, or two layers would share masks."""
    seen = set()
    n_local, S, n_micro = 12, 8, 32  # 96 layers / 8 stages, 32 microbatches
    for stage in range(S):
        for i in range(n_local):
            for tick in range(n_micro + S - 1):
                k = (stage * n_local + i) * 4096 + tick
                assert k not in seen
                seen.add(k)


def test_pipeline_with_dropout_runs_and_learns():
    """Dropout path (per stage/layer/tick folded keys) compiles, runs, and
    the loss goes down over a few steps."""
    cfg = _cfg(dropout=0.1)
    layout = cfg.vocab.layout()
    rng = np.random.RandomState(0)
    toks = rng.randint(1, layout.total_vocab_size, (1, 8, 64))
    toks[..., :] = toks[..., :1]  # constant rows: learnable
    batch = {"nlp": NLPTaskBatch(
        tokens=jnp.asarray(toks, jnp.int32),
        loss_mask=jnp.ones((1, 8, 64), jnp.float32),
        label=jnp.asarray(toks, jnp.int32))}
    cfg.mesh.data_parallel = 2
    cfg.mesh.pipeline_parallel = 2
    cfg.mesh.model_parallel = 2
    mesh = make_mesh(cfg.mesh)
    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    tx = make_optimizer(
        OptimizerConfig(lr=1e-2, lr_decay_style="constant"), 100)
    init_fn, step_fn = make_sharded_train_step(
        model, tx, jax.random.PRNGKey(0), batch, mesh)
    state = init_fn(batch)
    losses = []
    for i in range(6):
        state, m = step_fn(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses
