"""Suite aggregation + emergency checkpoint tests."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bdm_db1_tpu.eval.aggregate import (
    aggregate_results, load_results_output, normalized_score,
)


def test_normalized_score():
    assert normalized_score(0.0, -10.0, 10.0) == pytest.approx(0.5)
    assert normalized_score(10.0, -10.0, 10.0) == pytest.approx(1.0)
    assert normalized_score(-10.0, -10.0, 10.0) == pytest.approx(0.0)
    assert normalized_score(5.0, 0.0, 0.0) == 0.0  # degenerate baseline


def test_aggregate_headline_metric():
    results = [
        {"env": "a", "return_mean": 9.0},    # 0.95
        {"env": "b", "return_mean": 1.0},    # 0.55
        {"env": "c", "return_mean": -8.0},   # 0.10
        {"env": "unknown", "return_mean": 0.0},
    ]
    baselines = {k: {"random": -10.0, "expert": 10.0} for k in "abc"}
    agg = aggregate_results(results, baselines, threshold=0.5)
    assert agg["num_tasks"] == 3
    assert agg["num_missing_baselines"] == 1
    assert agg["fraction_ge_0.5"] == pytest.approx(2 / 3)


def test_load_results_output(tmp_path):
    p = tmp_path / "results.output"
    p.write_text("header noise\n"
                 + json.dumps({"env": "a", "return_mean": 1.0}) + "\n"
                 + json.dumps({"env": "b", "return_mean": 2.0}) + "\n")
    rows = load_results_output(str(p))
    assert [r["env"] for r in rows] == ["a", "b"]


def test_emergency_checkpoint_on_crash(tmp_path):
    from bdm_db1_tpu.core.config import OptimizerConfig, db1_tiny
    from bdm_db1_tpu.data.input_specs import NLPTaskBatch
    from bdm_db1_tpu.models.transformer_xl import TransformerXL
    from bdm_db1_tpu.train.step import (
        init_train_state, make_optimizer, make_train_step,
    )
    from bdm_db1_tpu.train.trainer import Trainer

    cfg = db1_tiny()
    cfg.model.dtype = "float32"
    cfg.train.train_iters = 100
    cfg.train.save_dir = str(tmp_path / "run")
    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    L = cfg.model.n_position
    toks = jnp.ones((1, 2, L), jnp.int32)
    batch = {"nlp": NLPTaskBatch(tokens=toks,
                                 loss_mask=jnp.ones_like(toks, jnp.float32),
                                 label=toks)}
    tx = make_optimizer(OptimizerConfig(lr=1e-3), 100)
    state = init_train_state(model, tx, jax.random.PRNGKey(0), batch)

    class CrashingLoader:
        def __init__(self):
            self.n = 0

        def __iter__(self):
            return self

        def __next__(self):
            self.n += 1
            if self.n > 3:
                raise RuntimeError("boom")
            return {"nlp": {
                "tokens": np.ones((1, 2, L), np.int32),
                "loss_mask": np.ones((1, 2, L), np.float32),
                "label": np.ones((1, 2, L), np.int32)}}

    step_fn = jax.jit(make_train_step(model, tx))
    trainer = Trainer(cfg, model, step_fn, state, CrashingLoader())
    with pytest.raises(RuntimeError, match="boom"):
        trainer.train()
    # emergency checkpoint landed at the crash step
    restored, client = trainer.ckpt.restore(trainer.state)
    assert client.get("emergency") is True
    assert int(restored.step) == 3
    trainer.ckpt.close()
