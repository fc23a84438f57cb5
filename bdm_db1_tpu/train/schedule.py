"""LR / weight-decay schedules (optax).

Same semantics as the reference's OptimizerParamScheduler
(reference: src/train_utils/optimizer_param_scheduler.py:20-235): linear
warmup then {constant | linear | cosine | inverse-square-root} decay to
``min_lr``, plus an independently scheduled weight-decay increment
({constant | linear | cosine} from start_wd to end_wd). Both are plain
``optax.Schedule`` functions of the step counter, so they live inside the
jitted update — no host-side scheduler object to checkpoint (the step count
is the whole state)."""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp

from bdm_db1_tpu.core.config import OptimizerConfig


def lr_schedule(cfg: OptimizerConfig, train_iters: int):
    warmup = cfg.lr_warmup_iters
    if cfg.lr_warmup_fraction is not None:
        warmup = int(cfg.lr_warmup_fraction * train_iters)
    decay_iters = cfg.lr_decay_iters or train_iters
    max_lr, min_lr = cfg.lr, cfg.min_lr
    delta = max_lr - min_lr
    style = cfg.lr_decay_style

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = max_lr * step / jnp.maximum(warmup, 1)
        frac = jnp.clip((step - warmup) / jnp.maximum(decay_iters - warmup, 1),
                        0.0, 1.0)
        if style == "constant":
            decayed = jnp.asarray(max_lr, jnp.float32)
        elif style == "linear":
            decayed = min_lr + delta * (1.0 - frac)
        elif style == "cosine":
            decayed = min_lr + delta * 0.5 * (jnp.cos(jnp.pi * frac) + 1.0)
        elif style == "inverse-square-root":
            s = jnp.maximum(step, 1.0)
            w = jnp.maximum(warmup, 1)
            decayed = jnp.minimum(max_lr, max_lr * jnp.sqrt(w / s))
        else:
            raise ValueError(f"unknown lr decay style {style!r}")
        return jnp.where((warmup > 0) & (step < warmup), warm, decayed)

    return schedule


def wd_schedule(cfg: OptimizerConfig, train_iters: int):
    start, end = cfg.start_weight_decay, cfg.end_weight_decay
    style = cfg.weight_decay_incr_style
    if style == "constant" or start == end:
        return lambda step: jnp.asarray(end, jnp.float32)

    def schedule(step):
        frac = jnp.clip(
            jnp.asarray(step, jnp.float32) / max(train_iters, 1), 0.0, 1.0)
        if style == "linear":
            return start + frac * (end - start)
        if style == "cosine":
            return start + 0.5 * (end - start) * (
                1.0 - jnp.cos(jnp.pi * frac))
        raise ValueError(f"unknown wd incr style {style!r}")

    return schedule
