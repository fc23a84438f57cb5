"""Mocked gym/d4rl import fallbacks (VERDICT r2 weak #7: the real-suite
paths had never been exercised, not even with mocks) and vectorized
tokenizer parity for the lockstep cohort's batched host path."""

import sys
import types

import numpy as np
import pytest


def _fake_gym(monkeypatch, made):
    class _Env:
        pass

    gym = types.ModuleType("gym")

    def make(name):
        made.append(name)
        return _Env()

    gym.make = make
    monkeypatch.setitem(sys.modules, "gym", gym)
    return gym


def test_make_env_gym_fallback(monkeypatch):
    """Unknown registry names fall through to gym.make
    (reference: evaluate_rl.py builds envs via gym)."""
    from bdm_db1_tpu.eval.envs import make_env

    made = []
    _fake_gym(monkeypatch, made)
    env = make_env("HalfCheetah-v2")
    assert made == ["HalfCheetah-v2"] and env is not None


def test_make_env_registry_wins_over_gym(monkeypatch):
    from bdm_db1_tpu.eval.envs import FakeContinuousEnv, make_env

    made = []
    _fake_gym(monkeypatch, made)
    env = make_env("fake-continuous-v0")
    assert isinstance(env, FakeContinuousEnv) and made == []


def test_suite_env_names_d4rl_fallback(monkeypatch):
    """suite_env_names imports d4rl.{suite}.ALL_ENVS
    (reference: evaluate_rl.py:529-539)."""
    from bdm_db1_tpu.eval.evaluate_rl import suite_env_names

    mod = types.ModuleType("d4rl.gym_mujoco")
    mod.ALL_ENVS = ["halfcheetah-medium-v2", "walker2d-medium-v2"]
    d4rl = types.ModuleType("d4rl")
    d4rl.gym_mujoco = mod
    monkeypatch.setitem(sys.modules, "d4rl", d4rl)
    monkeypatch.setitem(sys.modules, "d4rl.gym_mujoco", mod)
    assert suite_env_names("gym_mujoco") == [
        "halfcheetah-medium-v2", "walker2d-medium-v2"]


def test_rl_suite_creator_d4rl_fallback(monkeypatch, tmp_path):
    """make_rl_creator's 'rl_task_suite' creator resolves env lists via
    importlib d4rl.{suite}.ALL_ENVS when no suite_envs callable is given
    (data/rl_dataset.py:718-726)."""
    from bdm_db1_tpu.core.config import db1_tiny
    from bdm_db1_tpu.data.rl_dataset import (
        RLTokenizerSuite, TrajectoryStore, make_rl_creator,
    )
    from bdm_db1_tpu.eval.envs import FakeContinuousEnv
    from bdm_db1_tpu.tokenizers.scalar import ScalarTokenizer
    from bdm_db1_tpu.tokenizers.text import ByteTextTokenizer

    cfg = db1_tiny()
    suite = RLTokenizerSuite(
        cfg.vocab.layout(), ScalarTokenizer(cfg.vocab.num_continuous_bin),
        ByteTextTokenizer(), vision_patch_size=cfg.vision.patch_size)
    env = FakeContinuousEnv(obs_dim=3, act_dim=2, episode_len=5)
    store = TrajectoryStore.from_flat_dataset(env.make_dataset(6))
    store.save_cache(str(tmp_path), "fake-a")
    store.save_cache(str(tmp_path), "fake-b")

    mod = types.ModuleType("d4rl.fakesuite")
    mod.ALL_ENVS = ["fake-a", "fake-b"]
    d4rl = types.ModuleType("d4rl")
    d4rl.fakesuite = mod
    monkeypatch.setitem(sys.modules, "d4rl", d4rl)
    monkeypatch.setitem(sys.modules, "d4rl.fakesuite", mod)

    _, suite_creator = make_rl_creator(suite, str(tmp_path))
    train, valid, test = suite_creator(
        "fakesuite", "90,5,5", cfg.model.n_position, None, 1234)
    assert train is not None and len(train) > 0
    sample = train[0]
    assert sample["tokens"].shape == (cfg.model.n_position,)


def test_decode_action_batch_matches_single():
    from bdm_db1_tpu.core.config import db1_tiny
    from bdm_db1_tpu.data.rl_dataset import RLTokenizerSuite
    from bdm_db1_tpu.tokenizers.scalar import ScalarTokenizer
    from bdm_db1_tpu.tokenizers.text import ByteTextTokenizer

    cfg = db1_tiny()
    layout = cfg.vocab.layout()
    suite = RLTokenizerSuite(
        layout, ScalarTokenizer(cfg.vocab.num_continuous_bin),
        ByteTextTokenizer())
    rng = np.random.RandomState(0)
    cont = rng.randint(layout.continuous_offset,
                       layout.continuous_offset + 1024, (5, 6))
    batch = suite.decode_action_batch(cont, discrete=False)
    for i in range(5):
        np.testing.assert_array_equal(
            batch[i], suite.decode_action(cont[i], discrete=False))
    disc = rng.randint(layout.discrete_offset,
                       layout.discrete_offset + 16, (5, 1))
    dbatch = suite.decode_action_batch(disc, discrete=True)
    for i in range(5):
        assert int(dbatch[i]) == suite.decode_action(disc[i], discrete=True)


@pytest.mark.parametrize("env_kind", ["continuous", "discrete", "image"])
def test_encode_obs_batch_matches_single(env_kind):
    """The cohort's batched tokenize must be bit-identical to per-env
    encode_obs (VERDICT r2 next #1)."""
    from bdm_db1_tpu.core.config import db1_tiny
    from bdm_db1_tpu.data.rl_dataset import (
        RLFullDataset, RLTokenizerSuite, TrajectoryStore,
    )
    from bdm_db1_tpu.eval.envs import (
        FakeContinuousEnv, FakeDiscreteEnv, FakeImageEnv,
    )
    from bdm_db1_tpu.eval.wrapper import TokenizedEnv
    from bdm_db1_tpu.tokenizers.scalar import ScalarTokenizer
    from bdm_db1_tpu.tokenizers.text import ByteTextTokenizer

    cfg = db1_tiny()
    suite = RLTokenizerSuite(
        cfg.vocab.layout(), ScalarTokenizer(cfg.vocab.num_continuous_bin),
        ByteTextTokenizer(), vision_patch_size=cfg.vision.patch_size)
    if env_kind == "continuous":
        mk = lambda seed: FakeContinuousEnv(
            obs_dim=4, act_dim=2, episode_len=5, seed=seed)
    elif env_kind == "discrete":
        mk = lambda seed: FakeDiscreteEnv(
            obs_dim=3, n_actions=4, episode_len=5, seed=seed)
    else:
        mk = lambda seed: FakeImageEnv(
            hw=2 * cfg.vision.patch_size, n_actions=4, episode_len=5,
            seed=seed)
    store = TrajectoryStore.from_flat_dataset(mk(99).make_dataset(3))
    ds = RLFullDataset("fake", store, suite,
                       seq_length=cfg.model.n_position, seed=0)
    tenvs = [TokenizedEnv(mk(i), ds) for i in range(4)]
    raws = [t.env.reset() for t in tenvs]
    tok_b, img_b = tenvs[0].encode_obs_batch(raws)
    assert tok_b.shape == (4, tenvs[0].obs_length)
    for i, t in enumerate(tenvs):
        tok_s, img_s = t.encode_obs(raws[i])
        np.testing.assert_array_equal(tok_b[i], tok_s)
        if img_s is None:
            assert img_b is None
        else:
            np.testing.assert_array_equal(img_b[i], img_s[0])
