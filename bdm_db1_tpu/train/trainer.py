"""Training driver: the loop the reference references but never shipped.

Counterpart of the reference train loop
(reference: src/train_utils/train.py:32-243 — which has no runnable
``main``; SURVEY.md §2.9) plus the missing pretrain driver. Responsibilities:
iterate the stratified loader, run the sharded train step, log scalars,
periodically evaluate (valid loss per modality + RL episode rollouts), and
checkpoint with auto-resume.
"""

from __future__ import annotations

import time
import weakref
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bdm_db1_tpu.core.config import DB1Config
from bdm_db1_tpu.core.logging import MetricLogger, print_rank_0
from bdm_db1_tpu.data.input_specs import (
    ICTaskBatch,
    NLPTaskBatch,
    RLTaskBatch,
    VQATaskBatch,
)
from bdm_db1_tpu.train.checkpoint import CheckpointManager
from bdm_db1_tpu.train.step import make_train_rng

_BATCH_TYPES = {
    "rl": RLTaskBatch, "nlp": NLPTaskBatch, "ic": ICTaskBatch,
    "vqa": VQATaskBatch,
}


def to_gato_batch(raw: Dict[str, Dict[str, np.ndarray]]) -> Dict[str, object]:
    """Loader output {modality: {field: array}} -> typed device batch.
    Host-side bookkeeping fields the samples carry for eval (img_id,
    ques_id, ...) are dropped — only the task dataclass's fields go to
    device."""
    import dataclasses as _dc

    out = {}
    for m, fields in raw.items():
        # sub-modality groups ("rl_img") use the base modality's batch
        # type; the model routes them to the base embedder
        cls = _BATCH_TYPES[m.split("_")[0]]
        valid = {f.name for f in _dc.fields(cls)}
        out[m] = cls(**{k: jnp.asarray(v) for k, v in fields.items()
                        if k in valid})
    return out


class Trainer:
    def __init__(
        self,
        cfg: DB1Config,
        model,
        step_fn: Callable,
        state,
        loader: Iterable,
        *,
        eval_fn: Optional[Callable] = None,
        logger: Optional[MetricLogger] = None,
        mesh=None,
    ):
        self.cfg = cfg
        self.model = model
        self.step_fn = step_fn
        self.state = state
        self.loader = loader
        self.eval_fn = eval_fn
        self.mesh = mesh
        self.logger = logger or MetricLogger(cfg.train.save_dir)
        self.ckpt = (CheckpointManager(cfg.train.save_dir)
                     if cfg.train.save_dir else None)

    def maybe_resume(self) -> int:
        if self.ckpt is None:
            return 0
        restored, client = self.ckpt.restore(self.state)
        if restored is None:
            return 0
        self.state = restored
        it = int(client["iteration"]) if client else int(restored.step)
        print_rank_0(f"resumed from checkpoint at iteration {it}")
        return it

    def train(self) -> None:
        """Run the loop; on any crash, save an emergency checkpoint first
        (the failure-recovery the reference lacks, SURVEY.md §5)."""
        try:
            self._train_loop()
        except BaseException:
            if self.ckpt is not None:
                step = int(self.state.step)
                print_rank_0(
                    f"training interrupted — saving emergency checkpoint "
                    f"at iteration {step}")
                try:
                    self.ckpt.save(step, self.state,
                                   client_state={"iteration": step,
                                                 "emergency": True})
                    self.ckpt.wait()
                except Exception as e:  # keep the original traceback primary
                    print_rank_0(f"emergency checkpoint failed: {e}")
            raise

    def _train_loop(self) -> None:
        tcfg = self.cfg.train
        iteration = self.maybe_resume()
        rng = make_train_rng(tcfg.seed, tcfg.prng_impl)
        data_iter = iter(self.loader)
        tokens_per_batch = None
        t_window = time.perf_counter()
        window_iters = 0

        while iteration < tcfg.train_iters:
            raw = next(data_iter)
            batch = to_gato_batch(raw)
            if self.mesh is not None and jax.process_count() > 1:
                # assemble per-host shards into global arrays over the mesh
                from jax.experimental import multihost_utils
                from jax.sharding import PartitionSpec as P

                batch = multihost_utils.host_local_array_to_global_array(
                    batch, self.mesh, P(None, "data"))
            if tokens_per_batch is None:
                tokens_per_batch = sum(
                    int(np.prod(v.tokens.shape))
                    for v in batch.values() if hasattr(v, "tokens"))
            self.state, metrics = self.step_fn(self.state, batch, rng)
            iteration += 1
            window_iters += 1

            if iteration % tcfg.log_interval == 0:
                loss = float(metrics["loss"])
                dt = time.perf_counter() - t_window
                tps = tokens_per_batch * window_iters / max(dt, 1e-9)
                scalars = {"loss": loss, "tokens_per_sec": tps}
                if "grad_norm" in metrics:
                    scalars["grad_norm"] = float(metrics["grad_norm"])
                self.logger.log(iteration, scalars, prefix="train/")
                print_rank_0(
                    f"iter {iteration} | loss {loss:.4f} | "
                    f"{tps:,.0f} tok/s")
                t_window = time.perf_counter()
                window_iters = 0

            if self.eval_fn and iteration % tcfg.eval_interval == 0:
                eval_metrics = self.eval_fn(self.state, iteration)
                if eval_metrics:
                    self.logger.log(iteration, eval_metrics, prefix="valid/")

            if self.ckpt and iteration % tcfg.save_interval == 0:
                self.ckpt.save(iteration, self.state,
                               client_state={"iteration": iteration})

        if self.ckpt:
            self.ckpt.save(tcfg.train_iters, self.state,
                           client_state={"iteration": tcfg.train_iters})
            self.ckpt.wait()
        self.logger.close()


# Bounded FIFO of compiled valid-loss programs. Entries hold a weakref to
# the model so a recycled id() (model freed, new object at the same address)
# can never hit a stale program; the cap bounds retention — the jit closure
# keeps its model alive, so an unbounded id-keyed dict would leak every
# model (and its 1.2B executable) ever evaluated in the process.
_EVAL_LOSS_FNS: "Dict[int, Tuple[Any, Callable]]" = {}
_EVAL_LOSS_CAP = 4


def _eval_loss_fn(model) -> Callable:
    """One compiled valid-loss program per live model instance (the r1
    review flagged the unjitted per-batch ``model.apply`` here — at 1.2B
    every eval tick paid op-by-op dispatch)."""
    hit = _EVAL_LOSS_FNS.get(id(model))
    if hit is not None and hit[0]() is model:
        return hit[1]

    @jax.jit
    def fn(params, batch):
        _, loss = model.apply(
            {"params": params}, batch, compute_loss=True,
            deterministic=True, loss_only=True)
        return loss

    while len(_EVAL_LOSS_FNS) >= _EVAL_LOSS_CAP:
        _EVAL_LOSS_FNS.pop(next(iter(_EVAL_LOSS_FNS)))
    _EVAL_LOSS_FNS[id(model)] = (weakref.ref(model), fn)
    return fn


def evaluate_loss(model, state, batches, valid_vocab=None) -> float:
    """Mean masked CE over held-out batches (reference: train.py
    evaluate_and_print_results valid-loss path), one jitted program per
    batch structure; losses stay on device until one final host fetch
    (the tunnel costs ~27 ms per fetch — one per batch added up).

    Loader batches arrive as ``{modality: {field: [accum, micro, ...]}}``;
    the model consumes one ``[micro, ...]`` slice at a time (the train path
    scans over accum — here we just loop, eval is not throughput-bound)."""
    fn = _eval_loss_fn(model)
    losses = []
    for raw in batches:
        accum = len(next(iter(next(iter(raw.values())).values())))
        for a in range(accum):
            sub = {m: {k: v[a] for k, v in fields.items()}
                   for m, fields in raw.items()}
            losses.append(fn(state.params, to_gato_batch(sub)))
    return float(jnp.stack(losses).mean()) if losses else float("nan")
