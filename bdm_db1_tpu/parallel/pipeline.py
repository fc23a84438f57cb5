"""GPipe pipeline parallelism over the decoder-layer stack.

The reference only ships pipeline-parallel *bookkeeping* — process groups,
stage/rank getters, embedding-tie groups — with no schedule or send/recv
(reference: src/mpu/initialize.py:153-378; PP=1 in the launch script). This
module implements the real thing, TPU-style: no point-to-point NCCL calls,
no per-stage processes — one SPMD program where

* the ``nn.scan``-stacked layer parameters ``[n_layer, ...]`` shard over a
  ``pipe`` mesh axis (stage s holds layers ``[s*n_layer/S, (s+1)*n_layer/S)``),
* a ``jax.shard_map`` manual only over ``pipe`` (``data``/``model`` stay
  auto, so DP batch sharding and Megatron TP compose unchanged) runs the
  classic GPipe schedule: ``n_micro + S - 1`` ticks, each stage applying its
  local layers to the activation it holds and rotating the result to the
  next stage with ``jax.lax.ppermute``,
* gradients flow through ``ppermute``'s transpose (the reverse rotation),
  so one ``jax.grad`` differentiates the whole pipeline — no 1F1B hand
  scheduling, XLA overlaps the permute DMA with the next tick's compute.

Embedding and the (tied) loss head stay in the auto-sharded world outside
the shard_map, replicated over ``pipe`` — matching the reference's
embedding-tie design intent (first/last stage share the table;
reference: src/mpu/initialize.py:251-270) without the grad-sync group.

Training only (the TXL segment memory is disabled in training,
reference: src/model/transformer_xl.py:515-517); eval decode keeps the
single-stage KV-cache path, which is latency- not memory-bound.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from bdm_db1_tpu.ops.attention import causal_mask, same_length_mask
from bdm_db1_tpu.ops.positional import relative_positional_embedding


def _unbox(tree):
    return jax.tree.map(
        lambda x: x.unbox() if isinstance(x, nn.meta.AxisMetadata) else x,
        tree, is_leaf=lambda x: isinstance(x, nn.meta.AxisMetadata))


def _layer_module(cfg):
    from bdm_db1_tpu.models.transformer_xl import (
        DecoderLayer, remat_policy_for,
    )

    layer_cls = DecoderLayer
    if cfg.remat:
        layer_cls = nn.remat(DecoderLayer, static_argnums=(7,),
                             prevent_cse=False, policy=remat_policy_for(cfg))
    return layer_cls(cfg)


def pipeline_trunk(
    cfg,
    layer_params,            # stacked [n_layer, ...] pytree (boxed ok)
    r_w_bias, r_r_bias,      # shared biases (None when cfg.untie_r)
    h: jnp.ndarray,          # [B, L, D] embedded inputs
    n_micro: int,
    mesh: Mesh,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
):
    """GPipe forward over the layer stack; differentiable end to end.

    Equivalent (for deterministic runs, to float tolerance) to
    ``TransformerXL.trunk`` with ``mems=None`` — enforced by
    tests/test_pipeline.py against the single-stage trunk."""
    S = mesh.shape["pipe"]
    B, L, D = h.shape
    assert B % n_micro == 0, (B, n_micro)
    assert cfg.n_layer % S == 0, (cfg.n_layer, S)
    mb = B // n_micro
    dtype = jnp.dtype(cfg.dtype)

    if cfg.same_length:
        mask = same_length_mask(L, L, cfg.mem_len)
    else:
        mask = causal_mask(L, L)
    r = relative_positional_embedding(L, cfg.n_embed, cfg.effective_clamp_len)

    # mirror trunk()'s embedding dropout (applied to h and r), including
    # the byte-granular impl so both paths draw the same mask distribution
    if not deterministic and cfg.embd_pdrop > 0 and dropout_rng is not None:
        k_h, k_r, dropout_rng = jax.random.split(dropout_rng, 3)
        if getattr(cfg, "dropout_impl", "flax") == "u8":
            from bdm_db1_tpu.ops.fast_dropout import dropout_u8

            h = dropout_u8(h, cfg.embd_pdrop, k_h)
            r = dropout_u8(r, cfg.embd_pdrop, k_r)
        else:
            keep = 1.0 - cfg.embd_pdrop
            h = h * jax.random.bernoulli(k_h, keep, h.shape) / keep
            r = r * jax.random.bernoulli(k_r, keep, r.shape) / keep
    if dropout_rng is None:
        dropout_rng = jax.random.PRNGKey(0)  # unused when deterministic

    layer_mod = _layer_module(cfg)
    layer_params = _unbox(layer_params)
    rw = None if r_w_bias is None else _unbox(r_w_bias)
    rr = None if r_r_bias is None else _unbox(r_r_bias)
    bias_args = tuple(x for x in (rw, rr) if x is not None)

    param_specs = jax.tree.map(lambda _: P("pipe"), layer_params)
    bias_specs = tuple(P() for _ in bias_args)

    # everything the ticks read must enter through shard_map inputs: closure
    # constants keep the enclosing (all-Auto) mesh context on their
    # shardings, which the Manual-pipe body rejects under jit
    @partial(jax.shard_map, mesh=mesh, axis_names={"pipe"},
             in_specs=(param_specs, P(), P(), P(), P()) + bias_specs,
             out_specs=P())
    def run(local_params, h, r, mask, key, *biases):
        rw_in = biases[0] if biases else None
        rr_in = biases[1] if biases else None
        mem0 = jnp.zeros((mb, 0, cfg.n_embed), dtype)

        def stage_apply(local_params, x, tick, stage):
            """Apply this stage's n_layer/S local layers."""
            n_local = jax.tree.leaves(local_params)[0].shape[0]

            def body(x, xs):
                p, i = xs
                rngs = None
                if not deterministic:
                    k = jax.random.fold_in(
                        key, (stage * n_local + i) * 4096 + tick)
                    rngs = {"dropout": k}
                y, _ = layer_mod.apply(
                    {"params": p}, x, mem0, r, mask, rw_in, rr_in,
                    deterministic, rngs=rngs)
                return y, None

            x, _ = jax.lax.scan(body, x, (local_params, jnp.arange(n_local)))
            return x

        stage = jax.lax.axis_index("pipe")
        # strided microbatch split: row b -> (b // n_micro, b % n_micro), so
        # each device's contiguous DP shard splits locally (no resharding)
        hmb = h.reshape(mb, n_micro, L, D)
        # the carry is stage-dependent from tick 1 on: mark it varying over
        # pipe up front so the fori_loop carry type is stable
        buf = jax.lax.pcast(
            jnp.zeros((mb, L, D), h.dtype), ("pipe",), to="varying")
        outs = jax.lax.pcast(
            jnp.zeros((mb, n_micro, L, D), h.dtype), ("pipe",), to="varying")
        perm = [(i, (i + 1) % S) for i in range(S)]

        def tick(t, carry):
            buf, outs = carry
            m_in = jnp.clip(t, 0, n_micro - 1)
            inp = jnp.where(
                stage == 0,
                jax.lax.dynamic_index_in_dim(hmb, m_in, 1, keepdims=False),
                buf)
            out = stage_apply(local_params, inp, t, stage)
            # last stage banks finished microbatches (valid from tick S-1 on)
            m_out = jnp.clip(t - (S - 1), 0, n_micro - 1)
            cur = jax.lax.dynamic_index_in_dim(outs, m_out, 1, keepdims=False)
            take = jnp.logical_and(t >= S - 1, stage == S - 1)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(take, out, cur), m_out, 1)
            buf = jax.lax.ppermute(out, "pipe", perm)
            return buf, outs

        _, outs = jax.lax.fori_loop(0, n_micro + S - 1, tick, (buf, outs))
        # only the last stage holds real outputs; psum replicates them
        # (its transpose broadcasts cotangents back to the last stage)
        outs = jnp.where(stage == S - 1, outs, jnp.zeros_like(outs))
        outs = jax.lax.psum(outs, "pipe")
        return outs.reshape(B, L, D)

    return run(layer_params, h, r, mask, dropout_rng, *bias_args)


def make_pipelined_loss_fn(model, mesh: Mesh, n_micro: int):
    """Training loss with the trunk pipelined over the mesh's ``pipe`` axis.
    Drop-in for train.step.make_loss_fn's product."""
    from bdm_db1_tpu.models.transformer_xl import TransformerXL
    from bdm_db1_tpu.parallel.mesh import axis_rules

    cfg = model.cfg
    rules = axis_rules(mesh)

    def loss_fn(params, batch, rng):
        d_rng, p_rng, l_rng = jax.random.split(rng, 3)
        with nn.logical_axis_rules(rules):
            h, loss_mask, label = model.apply(
                {"params": params}, batch, deterministic=False,
                method=TransformerXL.embed_concat,
                rngs={"dropout": d_rng, "patch_pos": p_rng},
            )
            h = pipeline_trunk(
                cfg, params["layers"],
                params.get("r_w_bias"), params.get("r_r_bias"),
                h, n_micro, mesh, dropout_rng=l_rng, deterministic=False)
            loss = model.apply(
                {"params": params}, h, loss_mask, label,
                method=TransformerXL.loss_from_hidden)
        return loss

    return loss_fn
