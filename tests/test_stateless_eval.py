"""No-memory (fixed_prompt) eval mode: window decoder + host-side rolling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bdm_db1_tpu.core.config import db1_tiny
from bdm_db1_tpu.data.input_specs import RLTaskBatch
from bdm_db1_tpu.data.rl_dataset import (
    RLFullDataset, RLTokenizerSuite, TrajectoryStore,
)
from bdm_db1_tpu.eval.decode import WindowDecoder
from bdm_db1_tpu.eval.envs import FakeContinuousEnv
from bdm_db1_tpu.eval.harness import run_episode_stateless
from bdm_db1_tpu.eval.wrapper import TokenizedEnv
from bdm_db1_tpu.models.transformer_xl import TransformerXL
from bdm_db1_tpu.tokenizers.scalar import ScalarTokenizer
from bdm_db1_tpu.tokenizers.text import ByteTextTokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = db1_tiny(mem_len=0, same_length=False)
    cfg.model.dtype = "float32"
    suite = RLTokenizerSuite(
        cfg.vocab.layout(), ScalarTokenizer(cfg.vocab.num_continuous_bin),
        ByteTextTokenizer(), vision_patch_size=cfg.vision.patch_size)
    env = FakeContinuousEnv(obs_dim=4, act_dim=2, episode_len=12)
    store = TrajectoryStore.from_flat_dataset(
        FakeContinuousEnv(obs_dim=4, act_dim=2, episode_len=12,
                          seed=9).make_dataset(5))
    ds = RLFullDataset("fake", store, suite,
                       seq_length=cfg.model.n_position,
                       use_prompt=True, prompt_ratio=0.3, seed=0)
    tenv = TokenizedEnv(env, ds, eval_prompt_strategy="fixed_prompt")
    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    L = cfg.model.n_position
    tok = jnp.zeros((1, L), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), {"rl": RLTaskBatch(
        tokens=tok, position_id=tok, loss_mask=tok, label=tok)})["params"]
    decoder = WindowDecoder(
        model, params, cfg.vocab.layout(),
        obs_length=tenv.obs_length, action_length=tenv.action_length,
        discrete_action=False)
    return cfg, tenv, decoder


def test_window_decoder_tokens_in_range(setup):
    cfg, tenv, decoder = setup
    layout = cfg.vocab.layout()
    obs, _, _ = tenv.reset()
    seq = np.concatenate([obs, [tenv.separator_id]])
    act, new_seq = decoder.decode(seq)
    assert act.shape == (2,)
    assert (act >= layout.continuous_offset).all()
    assert (act < layout.separator_id).all()
    np.testing.assert_array_equal(new_seq[:-2], seq)
    np.testing.assert_array_equal(new_seq[-2:], act)


def test_window_decoder_batched_matches_single(setup):
    """decode_batch over rows with different live lengths must equal
    per-row single decodes (same compiled program, batched)."""
    cfg, tenv, decoder = setup
    obs1, _, _ = tenv.reset()
    seq1 = np.concatenate([obs1, [tenv.separator_id]])
    # a longer row: one full transition of history before the live obs
    obs2, _, _ = tenv.reset()
    hist_act, _ = decoder.decode(seq1)
    seq2 = np.concatenate([seq1, hist_act, obs2, [tenv.separator_id]])
    acts, extended = decoder.decode_batch([seq1, seq2])
    a1, _ = decoder.decode(seq1)
    a2, _ = decoder.decode(seq2)
    np.testing.assert_array_equal(acts[0], a1)
    np.testing.assert_array_equal(acts[1], a2)
    np.testing.assert_array_equal(extended[1][:len(seq2)], seq2)


@pytest.mark.parametrize("strategy", ["fixed_prompt", "moving"])
def test_stateless_episode_completes(setup, strategy):
    cfg, tenv, decoder = setup
    res = run_episode_stateless(
        tenv, decoder, use_prompt=True, prompt_strategy=strategy,
        rng=np.random.RandomState(0))
    assert res.episode_length == 12
    assert np.isfinite(res.episode_return)
