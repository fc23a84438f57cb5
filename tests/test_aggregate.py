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


def test_baseline_registry_json_roundtrip(tmp_path):
    from bdm_db1_tpu.eval.baselines import BaselineRegistry

    p = tmp_path / "baselines.json"
    p.write_text(json.dumps({
        "a": {"random": -10.0, "expert": 10.0},
        "b": {"random": 0, "expert": 100},
    }))
    reg = BaselineRegistry.from_json(str(p))
    assert len(reg) == 2 and "a" in reg
    assert reg.get("b") == {"random": 0.0, "expert": 100.0}
    out = tmp_path / "out.json"
    reg.save_json(str(out))
    assert BaselineRegistry.from_json(str(out)).table == reg.table


def test_baseline_registry_from_d4rl_mocked(monkeypatch):
    """d4rl's ref_min/ref_max extractor via an injected fake d4rl module
    (VERDICT r2 next #6: 'a d4rl ref_min/ref_max extractor for when d4rl
    exists')."""
    import sys
    import types

    from bdm_db1_tpu.eval.baselines import BaselineRegistry

    infos = types.ModuleType("d4rl.infos")
    infos.REF_MIN_SCORE = {"halfcheetah-medium-v2": -280.18,
                           "walker2d-medium-v2": 1.63,
                           "no-max-env": 0.0}
    infos.REF_MAX_SCORE = {"halfcheetah-medium-v2": 12135.0,
                           "walker2d-medium-v2": 4592.3}
    d4rl = types.ModuleType("d4rl")
    d4rl.infos = infos
    monkeypatch.setitem(sys.modules, "d4rl", d4rl)
    monkeypatch.setitem(sys.modules, "d4rl.infos", infos)

    reg = BaselineRegistry.from_d4rl()
    assert set(reg.table) == {"halfcheetah-medium-v2", "walker2d-medium-v2"}
    assert reg.get("halfcheetah-medium-v2")["expert"] == pytest.approx(12135.0)
    # env_names filter
    reg2 = BaselineRegistry.from_d4rl(["walker2d-medium-v2", "absent"])
    assert set(reg2.table) == {"walker2d-medium-v2"}


def test_baseline_registry_from_trajectory_cache(tmp_path):
    from bdm_db1_tpu.data.rl_dataset import TrajectoryStore
    from bdm_db1_tpu.eval.baselines import BaselineRegistry
    from bdm_db1_tpu.eval.envs import FakeContinuousEnv

    env = FakeContinuousEnv(obs_dim=3, act_dim=2, episode_len=5)
    store = TrajectoryStore.from_flat_dataset(env.make_dataset(20))
    store.save_cache(str(tmp_path), "fake-env")
    reg = BaselineRegistry.from_trajectory_cache(
        str(tmp_path), ["fake-env"], random_returns={"fake-env": -7.0})
    rec = reg.get("fake-env")
    assert rec["random"] == -7.0
    # expert = mean of the top-return decile of the cached trajectories
    rets = np.sort(store.traj_returns)[::-1]
    assert rec["expert"] == pytest.approx(float(rets[:2].mean()))


def test_aggregate_cli_end_to_end(tmp_path, capsys):
    """fake results + baselines JSON -> the headline fraction, via the CLI
    (VERDICT r2 next #6 'Done =' condition)."""
    from bdm_db1_tpu.eval.aggregate import main

    results = tmp_path / "results.output"
    results.write_text(
        json.dumps({"env": "a", "return_mean": 9.0}) + "\n"
        + json.dumps({"env": "b", "return_mean": 1.0}) + "\n"
        + json.dumps({"env": "c", "return_mean": -8.0}) + "\n")
    baselines = tmp_path / "baselines.json"
    baselines.write_text(json.dumps(
        {k: {"random": -10.0, "expert": 10.0} for k in "abc"}))
    summary = main([str(results), "--baselines", str(baselines)])
    assert summary["num_tasks"] == 3
    assert summary["fraction_ge_0.5"] == pytest.approx(2 / 3)
    printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert printed["fraction_ge_0.5"] == pytest.approx(2 / 3)


def test_aggregate_cli_merge_overrides(tmp_path, monkeypatch):
    """--d4rl seeds the registry; --baselines JSON entries override it."""
    import sys
    import types

    from bdm_db1_tpu.eval.aggregate import main

    infos = types.ModuleType("d4rl.infos")
    infos.REF_MIN_SCORE = {"a": 0.0}
    infos.REF_MAX_SCORE = {"a": 1.0}
    d4rl = types.ModuleType("d4rl")
    d4rl.infos = infos
    monkeypatch.setitem(sys.modules, "d4rl", d4rl)
    monkeypatch.setitem(sys.modules, "d4rl.infos", infos)

    results = tmp_path / "results.output"
    results.write_text(json.dumps({"env": "a", "return_mean": 5.0}) + "\n")
    override = tmp_path / "override.json"
    override.write_text(json.dumps({"a": {"random": 0.0, "expert": 100.0}}))
    # with the override, score = 0.05 (< 0.5); without it, 5.0 (>= 0.5)
    summary = main([str(results), "--d4rl",
                    "--baselines", str(override)])
    assert summary["fraction_ge_0.5"] == 0.0


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
