"""Full-loop learning test: behavior-clone a fake continuous env's expert
and verify the evaluated policy clearly beats random — exercises
data -> loader -> train step -> checkpointless eval in one flow."""

import jax
import numpy as np
import pytest

from bdm_db1_tpu.core.config import OptimizerConfig, db1_tiny
from bdm_db1_tpu.data.rl_dataset import (
    RLDataset, RLFullDataset, RLTokenizerSuite, TrajectoryStore,
)
from bdm_db1_tpu.data.samplers import RandomSampler, StratifiedGatoLoader
from bdm_db1_tpu.eval.envs import FakeContinuousEnv
from bdm_db1_tpu.eval.harness import evaluate_env
from bdm_db1_tpu.eval.wrapper import TokenizedEnv
from bdm_db1_tpu.models.transformer_xl import TransformerXL
from bdm_db1_tpu.tokenizers.scalar import ScalarTokenizer
from bdm_db1_tpu.tokenizers.text import ByteTextTokenizer
from bdm_db1_tpu.train.step import (
    init_train_state, make_optimizer, make_train_step,
)
from bdm_db1_tpu.train.trainer import to_gato_batch


def test_behavior_cloning_beats_random():
    cfg = db1_tiny(n_embed=128, n_layer=2, n_head=4, n_inner=512, mem_len=32)
    cfg.model.dtype = "float32"
    cfg.model.drop = 0.0
    cfg.model.embd_pdrop = 0.0
    suite = RLTokenizerSuite(
        cfg.vocab.layout(), ScalarTokenizer(cfg.vocab.num_continuous_bin),
        ByteTextTokenizer(), vision_patch_size=cfg.vision.patch_size)
    env = FakeContinuousEnv(obs_dim=4, act_dim=2, episode_len=20, seed=123)
    store = TrajectoryStore.from_flat_dataset(
        FakeContinuousEnv(obs_dim=4, act_dim=2, episode_len=20,
                          seed=7).make_dataset(60))
    full = RLFullDataset("fake", store, suite,
                         seq_length=cfg.model.n_position,
                         use_prompt=False, seed=0)
    ds = RLDataset(full, np.arange(len(full)))
    loader = StratifiedGatoLoader(
        {"rl": ds}, {"rl": RandomSampler(len(ds), 0, 32, 0, 1, seed=1)},
        {"rl": 32}, accum_steps=1)

    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    tx = make_optimizer(OptimizerConfig(
        lr=3e-3, lr_warmup_iters=20, lr_decay_style="cosine"), 250)
    state = init_train_state(model, tx, jax.random.PRNGKey(0),
                             to_gato_batch(next(loader)))
    step = jax.jit(make_train_step(model, tx))
    first_loss = None
    for i in range(250):
        state, m = step(state, to_gato_batch(next(loader)),
                        jax.random.PRNGKey(2))
        if first_loss is None:
            first_loss = float(m["loss"])
    loader.stop()
    final_loss = float(m["loss"])
    assert final_loss < first_loss * 0.8, (first_loss, final_loss)

    tenv = TokenizedEnv(env, full)
    out = evaluate_env(model, state.params, lambda: tenv, num_trials=2,
                       seed=5, use_prompt=False)

    env2 = FakeContinuousEnv(obs_dim=4, act_dim=2, episode_len=20, seed=123)
    rng = np.random.RandomState(0)
    random_rets = []
    for _ in range(4):
        env2.reset()
        done, ret = False, 0.0
        while not done:
            _, r, done, _ = env2.step(rng.uniform(-1, 1, 2))
            ret += r
        random_rets.append(ret)
    random_mean = float(np.mean(random_rets))

    # the cloned policy must recover a large fraction of the random->expert
    # gap (expert return ~ 0, random ~ -15)
    assert out["return_mean"] > random_mean * 0.5, (
        out["return_mean"], random_mean)
