"""Training state + jitted, sharded train step with gradient accumulation.

Replaces the reference's DeepSpeed engine loop
(reference: src/train_utils/train.py:210-243: python micro-batch loop +
engine.backward/step with fp16 loss scaling) with one device program:

* micro-batches stack on a leading accumulation axis and a ``lax.scan``
  accumulates fp32 gradients on-device — no per-micro host round trips;
* bf16 compute / fp32 master params, so no loss-scaling machinery at all
  (the reference needs DeepSpeed's dynamic scaler only because of fp16);
* DP gradient reduction is emitted by pjit from the batch sharding; TP
  comes from the weight shardings (parallel/mesh.py) — the same step
  function runs 1-chip or pod-slice unchanged.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from bdm_db1_tpu.core.config import OptimizerConfig
from bdm_db1_tpu.parallel.mesh import (
    LOGICAL_AXIS_RULES, axis_rules, batch_sharding,
)
from bdm_db1_tpu.train.schedule import lr_schedule, wd_schedule


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def _decay_mask(params):
    """Weight decay on matrices only (biases/LayerNorm/embeddings-1d excluded)."""
    return jax.tree.map(lambda p: jnp.ndim(p) >= 2, params)


def make_optimizer(cfg: OptimizerConfig, train_iters: int) -> optax.GradientTransformation:
    if cfg.fused and cfg.optimizer == "adamw":
        return fused_adamw(cfg, train_iters)
    lr = lr_schedule(cfg, train_iters)
    wd = wd_schedule(cfg, train_iters)
    parts = []
    if cfg.clip_grad and cfg.clip_grad > 0:
        parts.append(optax.clip_by_global_norm(cfg.clip_grad))
    if cfg.optimizer in ("adamw", "adam"):
        if cfg.adam_nu_dtype:
            parts.append(_scale_by_adam_nu(
                b1=cfg.adam_beta1, b2=cfg.adam_beta2, eps=cfg.adam_eps,
                mu_dtype=cfg.adam_mu_dtype, nu_dtype=cfg.adam_nu_dtype))
        else:
            parts.append(optax.scale_by_adam(
                b1=cfg.adam_beta1, b2=cfg.adam_beta2, eps=cfg.adam_eps,
                mu_dtype=cfg.adam_mu_dtype))
    elif cfg.optimizer == "sgd":
        pass  # plain (scaled) gradient
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    if cfg.optimizer == "adamw" and cfg.weight_decay:
        parts.append(optax.masked(
            _ScheduledWeightDecay(wd), _decay_mask))
    parts.append(_scale_by_schedule_neg(lr))
    return optax.chain(*parts)


def _scale_by_adam_nu(b1, b2, eps, mu_dtype=None,
                      nu_dtype=None) -> optax.GradientTransformation:
    """``optax.scale_by_adam`` with a storage dtype for the SECOND moment
    too (optax exposes ``mu_dtype`` only). Moment math runs in f32 and
    rounds on store; with ``nu_dtype=None``/f32 the update matches optax's
    to f32 rounding (pinned by tests/test_train_step.py). The point is the
    optimizer's HBM floor: at 1.2B the f32 nu tree is another ~4.8 GB of
    read+write per step that bf16 halves (the mu tree already can via
    ``adam_mu_dtype``)."""
    mu_dtype = jnp.dtype(mu_dtype) if mu_dtype else None
    nu_dtype = jnp.dtype(nu_dtype) if nu_dtype else None

    def init(params):
        mu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=mu_dtype or p.dtype), params)
        nu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=nu_dtype or p.dtype), params)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu)

    def update(updates, state, params=None):
        del params
        count = optax.safe_increment(state.count)
        cf = count.astype(jnp.float32)
        b1c = 1.0 - b1 ** cf
        b2c = 1.0 - b2 ** cf

        def leaf(g, m, v):
            gf = g.astype(jnp.float32)
            mf = b1 * m.astype(jnp.float32) + (1.0 - b1) * gf
            vf = b2 * v.astype(jnp.float32) + (1.0 - b2) * gf * gf
            u = (mf / b1c) / (jnp.sqrt(vf / b2c) + eps)
            return (mf.astype(m.dtype), vf.astype(v.dtype), u.astype(g.dtype))

        out = jax.tree.map(leaf, updates, state.mu, state.nu)
        is_triple = lambda t: isinstance(t, tuple) and len(t) == 3
        mu = jax.tree.map(lambda t: t[0], out, is_leaf=is_triple)
        nu = jax.tree.map(lambda t: t[1], out, is_leaf=is_triple)
        upd = jax.tree.map(lambda t: t[2], out, is_leaf=is_triple)
        return upd, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def fused_adamw(cfg: OptimizerConfig,
                train_iters: int) -> optax.GradientTransformation:
    """Single-tree_map AdamW: clip-scale, moment updates, bias correction,
    decoupled weight decay and the LR schedule all land in ONE elementwise
    pass per parameter leaf (state: one ``optax.ScaleByAdamState``).

    Mathematically the same update as the 4-stage chain in
    :func:`make_optimizer` (tests/test_train_step.py pins them together);
    per-leaf math runs in f32 regardless of storage dtype, so bf16-moment
    runs differ from the chain only by elementwise rounding. The point is
    HBM: the chain's staged ``updates`` trees give XLA fusion barriers at
    every optax stage boundary, and at 1.2B each materialized stage is
    another ~4.8 GB round trip.
    """
    lr = lr_schedule(cfg, train_iters)
    wd = wd_schedule(cfg, train_iters)
    b1, b2, eps = cfg.adam_beta1, cfg.adam_beta2, cfg.adam_eps
    mu_dtype = jnp.dtype(cfg.adam_mu_dtype) if cfg.adam_mu_dtype else None

    def init(params):
        mu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=mu_dtype or p.dtype), params)
        nu = jax.tree.map(jnp.zeros_like, params)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu)

    def update(grads, state, params):
        assert params is not None, "fused_adamw needs params (weight decay)"
        # schedules see the pre-increment count (chain parity); bias
        # correction the post-increment one (optax scale_by_adam parity)
        lr_t = lr(state.count).astype(jnp.float32)
        wd_t = wd(state.count).astype(jnp.float32)
        count = optax.safe_increment(state.count)
        cf = count.astype(jnp.float32)
        b1c = 1.0 - b1 ** cf
        b2c = 1.0 - b2 ** cf
        if cfg.clip_grad and cfg.clip_grad > 0:
            gnorm = optax.global_norm(grads)
            clip_s = jnp.where(gnorm < cfg.clip_grad, 1.0,
                               cfg.clip_grad / gnorm).astype(jnp.float32)
        else:
            clip_s = jnp.float32(1.0)

        def leaf(g, m, v, p):
            gf = g.astype(jnp.float32) * clip_s
            mf = b1 * m.astype(jnp.float32) + (1.0 - b1) * gf
            vf = b2 * v.astype(jnp.float32) + (1.0 - b2) * gf * gf
            u = (mf / b1c) / (jnp.sqrt(vf / b2c) + eps)
            if cfg.weight_decay and jnp.ndim(p) >= 2:  # matrices only
                u = u + wd_t * p.astype(jnp.float32)
            return (mf.astype(m.dtype), vf.astype(v.dtype),
                    (-lr_t * u).astype(p.dtype))

        out = jax.tree.map(leaf, grads, state.mu, state.nu, params)
        is_triple = lambda t: isinstance(t, tuple) and len(t) == 3
        mu = jax.tree.map(lambda t: t[0], out, is_leaf=is_triple)
        nu = jax.tree.map(lambda t: t[1], out, is_leaf=is_triple)
        updates = jax.tree.map(lambda t: t[2], out, is_leaf=is_triple)
        return updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def _scale_by_schedule_neg(sched) -> optax.GradientTransformation:
    def init(params):
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update(updates, state, params=None):
        s = sched(state.count)
        updates = jax.tree.map(lambda u: -s * u, updates)
        return updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init, update)


def _ScheduledWeightDecay(wd_sched) -> optax.GradientTransformation:
    """Adds wd(step) * param to the (pre-LR) update, AdamW style."""

    def init(params):
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update(updates, state, params):
        w = wd_sched(state.count)
        updates = jax.tree.map(lambda u, p: u + w * p, updates, params)
        return updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------------------


def make_train_rng(seed: int, impl: str = "rbg"):
    """Training rng (feeds the dropout masks). "rbg" keys lower the bit
    generation to the hardware RngBitGenerator — threefry mask generation
    costs ~16% of the 1.2B train step on v5e (bench.py --no-dropout vs
    default). Falls back to threefry if the impl is unavailable."""
    try:
        return jax.random.key(seed, impl=impl)
    except Exception:
        return jax.random.PRNGKey(seed)


def make_loss_fn(model, rules=None) -> Callable:
    rules = list(rules if rules is not None else LOGICAL_AXIS_RULES)

    def loss_fn(params, batch, rng):
        d_rng, p_rng = jax.random.split(rng)
        # logical-axis rules in scope so in-model sharding constraints
        # (e.g. Megatron-SP activation sharding) resolve to mesh axes
        with nn.logical_axis_rules(rules):
            _, loss = model.apply(
                {"params": params}, batch, compute_loss=True,
                deterministic=False, loss_only=True,
                rngs={"dropout": d_rng, "patch_pos": p_rng},
            )
        return loss

    return loss_fn


def make_train_step(model, tx: optax.GradientTransformation,
                    with_grad_norm: bool = False,
                    loss_fn: Optional[Callable] = None) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics).

    ``batch`` leaves carry a leading [accum, ...] axis; the scan accumulates
    fp32 grads across micro-batches before one optimizer update. accum == 1
    skips the accumulation machinery entirely (3 fewer full-parameter HBM
    passes). grad_norm is off by default — optax's clip already computes it
    internally; a second ``global_norm`` is another full pass over 1.2B
    params."""
    if loss_fn is None:
        loss_fn = make_loss_fn(model)

    def train_step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        accum = jax.tree.leaves(batch)[0].shape[0]
        rngs = jax.random.split(jax.random.fold_in(rng, state.step), accum)

        grad_fn = jax.value_and_grad(loss_fn)

        if accum == 1:
            micro = jax.tree.map(lambda x: x[0], batch)
            loss, grads = grad_fn(state.params, micro, rngs[0])
        else:
            def body(carry, xs):
                gsum, lsum = carry
                mb, r = xs
                l, grads = grad_fn(state.params, mb, r)
                gsum = jax.tree.map(
                    lambda a, g: a + g.astype(jnp.float32), gsum, grads)
                return (gsum, lsum + l), None

            zeros = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
            (gsum, lsum), _ = jax.lax.scan(
                body, (zeros, jnp.zeros([], jnp.float32)), (batch, rngs))
            grads = jax.tree.map(lambda g: g / accum, gsum)
            loss = lsum / accum

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "step": state.step}
        if with_grad_norm:
            metrics["grad_norm"] = optax.global_norm(grads)
        return state.replace(
            step=state.step + 1, params=params, opt_state=opt_state), metrics

    return train_step


# ---------------------------------------------------------------------------


def init_train_state(model, tx, rng, example_batch) -> TrainState:
    # example batches carry [accum, micro, ...] leaves; init on one micro
    micro = jax.tree.map(lambda x: x[0], example_batch)
    variables = model.init(rng, micro)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros([], jnp.int32), params=params,
        opt_state=tx.init(params))


def state_shardings(model, tx, rng, example_batch, mesh: Mesh):
    """Abstract-init the state and map logical axis metadata to NamedShardings."""
    abstract = jax.eval_shape(
        partial(init_train_state, model, tx, rng), example_batch)
    logical = nn.get_partition_spec(abstract)
    return nn.logical_to_mesh_sharding(logical, mesh, list(axis_rules(mesh)))


def make_sharded_train_step(model, tx, rng, example_batch, mesh: Mesh,
                            pipeline_microbatches: Optional[int] = None):
    """(init_fn, step_fn) jitted with parameter/batch shardings over the mesh.

    The example batch (and every later batch) carries [accum, micro, ...]
    leaves; micro shards over the "data" axis. On a mesh with a "pipe" axis
    the trunk runs the GPipe schedule (parallel/pipeline.py) with the micro
    batch further split into ``pipeline_microbatches`` chunks (default
    2 * stages, bubble fraction (S-1)/(n+S-1))."""
    shardings = state_shardings(model, tx, rng, example_batch, mesh)
    bspec = jax.tree.map(
        lambda _: NamedSharding(mesh, PartitionSpec(None, "data")),
        example_batch)
    loss_fn = None
    if "pipe" in mesh.axis_names and mesh.shape["pipe"] > 1:
        from bdm_db1_tpu.parallel.pipeline import make_pipelined_loss_fn

        # MeshConfig documents "-1 -> default": treat None/0/negative alike
        # here (the API boundary) so callers can forward the config field
        # verbatim without reproducing the sentinel translation.
        pp_micro = pipeline_microbatches
        n_micro = (pp_micro if pp_micro and pp_micro > 0
                   else 2 * mesh.shape["pipe"])
        loss_fn = make_pipelined_loss_fn(model, mesh, n_micro)
    init_fn = jax.jit(
        partial(init_train_state, model, tx, rng),
        out_shardings=shardings)
    step_fn = jax.jit(
        make_train_step(model, tx, loss_fn=loss_fn),
        in_shardings=(shardings, bspec, None),
        out_shardings=(shardings, None),
        donate_argnums=(0,),
    )
    return init_fn, step_fn
