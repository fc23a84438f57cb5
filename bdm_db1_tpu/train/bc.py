"""Behavior cloning on an env's expert data (few-shot finetune).

The reference exposes few-shot RL finetuning through
``RLFinetuneDataset`` + ``--num-rl-fewshot_episodes``
(reference: src/data/rl_dataset.py:927-971; src/train_utils/
train_config.py _add_finetune_args); this module is the runnable form of
that knob: pack expert trajectories from an ``RLFullDataset`` into Gato
training rows and run a handful of AdamW steps from the given params.

Its bench-side job: give the speculative decoder a policy with REAL
temporal smoothness. Random weights reject every guess (the 0% endpoint)
and zeroed weights accept every guess (the 100% ceiling); a policy cloned
from a smooth expert sits strictly between — the operating point
``bench.py --speculate --spec-policy bc`` measures.
"""

from __future__ import annotations

import copy
from typing import Optional

import numpy as np


def pack_bc_batch(ds, sample_ids, micro: int):
    """Stack ``micro`` dataset rows per micro-batch into the [accum=1,
    micro, L] leaves the train step expects (train/trainer.py
    to_gato_batch layout). Mixed-image rows are not supported here (the
    BC bench geometry is proprioceptive)."""
    rows = [ds.get(int(i)) for i in sample_ids]
    assert len(rows) % micro == 0, (len(rows), micro)
    out = []
    for b0 in range(0, len(rows), micro):
        grp = rows[b0:b0 + micro]
        raw = {"rl": {
            k: np.stack([r[k] for r in grp])[None]
            for k in ("tokens", "position_id", "loss_mask", "label")
        }}
        out.append(raw)
    return out


def behavior_clone(cfg, params, ds, *, steps: int = 150, micro: int = 4,
                   lr: float = 1e-4, seed: int = 0,
                   distinct_batches: int = 8, log_every: int = 0,
                   remat: Optional[bool] = None):
    """Finetune ``params`` by BC on ``ds`` (loss is already action-masked
    by the dataset packing) and return the new params.

    Single-device by design — this is the bench/few-shot path, not the
    pretrain driver (train/pretrain.py owns meshes). ``cfg`` is the full
    DB1Config; a training clone of the model (remat on at flagship scale,
    dropout kept) shares the parameter tree with the eval model, so the
    returned params drop straight into the decoder.
    """
    import jax
    import jax.numpy as jnp

    from bdm_db1_tpu.core.config import OptimizerConfig
    from bdm_db1_tpu.models.transformer_xl import TransformerXL
    from bdm_db1_tpu.train.step import (
        TrainState, make_optimizer, make_train_rng, make_train_step,
    )
    from bdm_db1_tpu.train.trainer import to_gato_batch

    tcfg = copy.deepcopy(cfg)
    if remat is None:
        remat = tcfg.model.n_layer >= 24  # flagship needs the HBM headroom
    tcfg.model.remat = remat
    model = TransformerXL(tcfg.model, tcfg.vocab, tcfg.vision)

    rng = np.random.RandomState(seed)
    n_rows = distinct_batches * micro
    sample_ids = rng.choice(len(ds), size=n_rows, replace=len(ds) < n_rows)
    batches = [to_gato_batch(b)
               for b in pack_bc_batch(ds, sample_ids, micro)]

    opt = OptimizerConfig(lr=lr, min_lr=lr * 0.1, weight_decay=0.0,
                          lr_warmup_iters=max(1, steps // 10),
                          lr_decay_style="cosine")
    tx = make_optimizer(opt, steps)
    step_fn = jax.jit(make_train_step(model, tx), donate_argnums=(0,))
    state = TrainState(step=jnp.zeros([], jnp.int32), params=params,
                       opt_state=tx.init(params))
    key = make_train_rng(seed + 1)
    last = None
    for i in range(steps):
        state, metrics = step_fn(state, batches[i % len(batches)], key)
        if log_every and (i % log_every == 0 or i == steps - 1):
            last = float(metrics["loss"])
            print(f"  bc step {i}: loss {last:.4f}", flush=True)
    return state.params
