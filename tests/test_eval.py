"""End-to-end RL evaluation tests with fake envs: tokenized wrapper, jitted
decode with memory carry, full episodes (SURVEY.md §4 item d)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bdm_db1_tpu.core.config import db1_tiny
from bdm_db1_tpu.data.input_specs import RLTaskBatch
from bdm_db1_tpu.data.rl_dataset import (
    RLFullDataset,
    RLTokenizerSuite,
    TrajectoryStore,
)
from bdm_db1_tpu.eval.decode import build_decoder_for_env
from bdm_db1_tpu.eval.envs import FakeContinuousEnv, FakeDiscreteEnv
from bdm_db1_tpu.eval.harness import evaluate_env, run_episode, shard_envs
from bdm_db1_tpu.eval.wrapper import TokenizedEnv
from bdm_db1_tpu.models.transformer_xl import TransformerXL
from bdm_db1_tpu.tokenizers.scalar import ScalarTokenizer
from bdm_db1_tpu.tokenizers.text import ByteTextTokenizer


def _setup(env_cls, **env_kw):
    cfg = db1_tiny()
    cfg.model.dtype = "float32"
    suite = RLTokenizerSuite(
        cfg.vocab.layout(), ScalarTokenizer(cfg.vocab.num_continuous_bin),
        ByteTextTokenizer(), vision_patch_size=cfg.vision.patch_size)
    env = env_cls(**env_kw)
    store = TrajectoryStore.from_flat_dataset(env.make_dataset(5))
    ds = RLFullDataset(
        "fake", store, suite, seq_length=cfg.model.n_position,
        use_prompt=True, seed=0)
    tenv = TokenizedEnv(env, ds)

    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    L = cfg.model.n_position
    tokens = jnp.zeros((1, L), jnp.int32)
    init_batch = {"rl": RLTaskBatch(
        tokens=tokens, position_id=jnp.zeros_like(tokens),
        loss_mask=jnp.ones_like(tokens), label=tokens)}
    params = model.init(jax.random.PRNGKey(0), init_batch)["params"]
    return cfg, model, params, tenv


def test_tokenized_env_continuous():
    cfg, model, params, tenv = _setup(
        FakeContinuousEnv, obs_dim=4, act_dim=2, episode_len=5)
    toks, img, mask = tenv.reset()
    assert toks.shape == (4,)
    assert img is None and mask is None
    layout = cfg.vocab.layout()
    assert (toks >= layout.continuous_offset).all()
    prompt, pimg = tenv.get_prompt()
    # strict-length prompt: transition_num full transitions
    assert len(prompt) == tenv.ds.transition_num * tenv.ds.step_size


def test_episode_continuous_moving_prompt():
    cfg, model, params, tenv = _setup(
        FakeContinuousEnv, obs_dim=4, act_dim=2, episode_len=5)
    decoder = build_decoder_for_env(model, params, tenv)
    res = run_episode(tenv, decoder, use_prompt=True,
                      rng=np.random.RandomState(0))
    assert res.episode_length == 5
    assert np.isfinite(res.episode_return)


def test_episode_discrete_action_in_range():
    cfg, model, params, tenv = _setup(
        FakeDiscreteEnv, obs_dim=3, n_actions=4, episode_len=6)
    decoder = build_decoder_for_env(model, params, tenv)

    actions_seen = []
    orig_step = tenv.env.step

    def spy_step(a):
        actions_seen.append(a)
        return orig_step(a)

    tenv.env.step = spy_step
    res = run_episode(tenv, decoder, use_prompt=True,
                      rng=np.random.RandomState(0))
    assert res.episode_length == 6
    assert all(0 <= a < 4 for a in actions_seen)


def test_env_action_mask_respected():
    cfg, model, params, tenv = _setup(
        FakeDiscreteEnv, obs_dim=3, n_actions=4, episode_len=3)
    decoder = build_decoder_for_env(model, params, tenv)
    mems = decoder.init_mems(1)
    toks, _, _ = tenv.reset()
    prime = np.concatenate([toks, [tenv.separator_id]])
    # only action 2 allowed
    mask = np.array([0, 0, 1, 0], dtype=np.float32)
    act_toks, _ = decoder.decode(prime, mems, env_action_mask=mask)
    raw = tenv.tok.decode_action(act_toks, True)
    assert raw == 2


def test_evaluate_env_averaging():
    cfg, model, params, tenv = _setup(
        FakeContinuousEnv, obs_dim=4, act_dim=2, episode_len=4)
    out = evaluate_env(model, params, lambda: tenv, num_trials=2, seed=7,
                       max_step_size=4)
    assert out["num_trials"] == 2
    assert out["length_mean"] == 4.0
    assert np.isfinite(out["return_mean"])


def test_shard_envs_partition():
    envs = [f"e{i}" for i in range(7)]
    shards = [shard_envs(envs, process_index=i, process_count=3)
              for i in range(3)]
    flat = sorted(x for s in shards for x in s)
    assert flat == sorted(envs)
    assert max(len(s) for s in shards) - min(len(s) for s in shards) <= 1


def test_decoder_pool_shares_by_geometry():
    from bdm_db1_tpu.eval.decode import DecoderPool

    cfg, model, params, tenv1 = _setup(
        FakeContinuousEnv, obs_dim=4, act_dim=2, episode_len=3)
    pool = DecoderPool(model, params)
    d1 = pool.get(tenv1)
    # same geometry -> same decoder object
    _, _, _, tenv2 = _setup(
        FakeContinuousEnv, obs_dim=4, act_dim=2, episode_len=5)
    d2 = pool.get(tenv2)
    assert d1 is d2
    # different geometry -> new decoder
    _, _, _, tenv3 = _setup(
        FakeDiscreteEnv, obs_dim=3, n_actions=4, episode_len=3)
    d3 = pool.get(tenv3)
    assert d3 is not d1
