"""RL dataset tests: segmentation, sample construction, cache roundtrip,
prompt conditioning, expert demos (reference behaviors from
src/data/rl_dataset.py)."""

import numpy as np
import pytest

from bdm_db1_tpu.core.config import db1_tiny
from bdm_db1_tpu.data.rl_dataset import (
    RLFullDataset,
    RLTokenizerSuite,
    TrajectoryStore,
    segment,
)
from bdm_db1_tpu.eval.envs import FakeContinuousEnv, FakeDiscreteEnv, FakeImageEnv
from bdm_db1_tpu.tokenizers.scalar import ScalarTokenizer
from bdm_db1_tpu.tokenizers.text import ByteTextTokenizer


def _suite(cfg):
    return RLTokenizerSuite(
        cfg.vocab.layout(),
        ScalarTokenizer(cfg.vocab.num_continuous_bin),
        ByteTextTokenizer(),
        vision_patch_size=cfg.vision.patch_size,
    )


def test_segment_splits_on_terminals():
    obs = np.arange(10)[:, None]
    term = np.zeros(10, bool)
    term[[3, 7]] = True
    trajs = segment((obs,), term)
    lengths = [len(t[0]) for t in trajs]
    assert lengths == [4, 4, 2]


def test_store_from_flat_and_cache_roundtrip(tmp_path):
    env = FakeContinuousEnv(obs_dim=4, act_dim=2, episode_len=6)
    store = TrajectoryStore.from_flat_dataset(env.make_dataset(5))
    assert store.num_trajectories == 5
    assert (store.path_lengths == 6).all()

    store.save_cache(str(tmp_path), "fake-env")
    lazy = TrajectoryStore.from_cache_dir(str(tmp_path), "fake-env")
    assert lazy.num_trajectories == 5
    o1, a1 = store.get(2, 1, 4)
    o2, a2 = lazy.get(2, 1, 4)
    np.testing.assert_array_equal(o1, o2)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_allclose(store.traj_returns, lazy.traj_returns)


def test_dataset_sample_geometry():
    cfg = db1_tiny()
    env = FakeContinuousEnv(obs_dim=4, act_dim=2, episode_len=8)
    store = TrajectoryStore.from_flat_dataset(env.make_dataset(4))
    ds = RLFullDataset("fake", store, _suite(cfg), seq_length=64,
                       use_prompt=False, seed=0)
    # trans_dim = 6, step = 7, transition_num = (64+6)//7 = 10
    assert ds.observation_dim == 4 and ds.action_dim == 2
    assert ds.transition_num == 10
    assert len(ds) == store.path_lengths.sum()

    s = ds.get(0)
    assert s["tokens"].shape == (64,)
    layout = cfg.vocab.layout()
    valid = s["tokens"][s["tokens"] >= 0]
    assert valid.max() < layout.total_vocab_size
    # separator at offset obs_dim of each full transition
    assert s["tokens"][4] == layout.separator_id
    assert s["tokens"][11] == layout.separator_id
    # label shift
    np.testing.assert_array_equal(s["label"][:-1], s["tokens"][1:])
    # loss only on actions: positions 5,6 mod 7
    idx = np.arange(65)
    exp_flags = ((idx % 7) > 4).astype(np.float32)[1:]
    # trailing region after the trajectory end may be zeroed
    assert (s["loss_mask"] <= exp_flags).all()
    assert s["loss_mask"].sum() > 0


def test_dataset_prompt_conditioning_masks_prompt_actions():
    cfg = db1_tiny()
    env = FakeContinuousEnv(obs_dim=4, act_dim=2, episode_len=30)
    store = TrajectoryStore.from_flat_dataset(env.make_dataset(4))
    ds = RLFullDataset("fake", store, _suite(cfg), seq_length=64,
                       use_prompt=True, prompt_prob=1.0,
                       prompt_at_final_transition_prob=1.0, seed=0)
    s = ds.get(0)
    step = ds.step_size
    prepend = ds.prompt_transition_num
    # all prompt action positions carry no loss
    assert s["loss_mask"][: prepend * step - 1].sum() == 0
    assert s["loss_mask"].sum() > 0


def test_discrete_env_dataset():
    cfg = db1_tiny()
    env = FakeDiscreteEnv(obs_dim=3, n_actions=4, episode_len=10)
    store = TrajectoryStore.from_flat_dataset(env.make_dataset(3))
    ds = RLFullDataset("fake-d", store, _suite(cfg), seq_length=64,
                       use_prompt=False, seed=0)
    assert ds.observation_dim == 3 and ds.action_dim == 1
    s = ds.get(5)
    layout = cfg.vocab.layout()
    # discrete tokens overlap text ids; action tokens < num_discrete_values
    act_positions = s["loss_mask"].astype(bool)
    acts = s["label"][act_positions]
    assert acts.max() < layout.num_discrete_values


def test_image_env_dataset():
    cfg = db1_tiny()
    env = FakeImageEnv(hw=2 * cfg.vision.patch_size, n_actions=4,
                       episode_len=6)
    store = TrajectoryStore.from_flat_dataset(env.make_dataset(2))
    ds = RLFullDataset("fake-img", store, _suite(cfg), seq_length=64,
                       use_prompt=False, seed=0)
    assert ds.observation_dim == 4  # 4 patches
    s = ds.get(0)
    assert "images" in s
    assert s["images"].shape[0] == ds.transition_num
    assert s["images"].shape[-1] == 3  # HWC
    # -1 placeholders cover every obs region of every transition in-sequence
    n_slots = int((s["tokens"] == -1).sum())
    assert n_slots > 0


def test_expert_demonstration_strict_length():
    cfg = db1_tiny()
    env = FakeContinuousEnv(obs_dim=4, act_dim=2, episode_len=5)
    store = TrajectoryStore.from_flat_dataset(env.make_dataset(6))
    ds = RLFullDataset("fake", store, _suite(cfg), seq_length=64,
                       use_prompt=True, seed=0)
    demo = ds.sample_expert_demonstration(
        "moving_prompt", strict_length=True, sample_peak=True)
    # episodes are len 5 < transition_num 10 -> concat until long enough
    assert demo["actions"].shape[0] == ds.transition_num
    layout = cfg.vocab.layout()
    assert demo["actions"].min() >= layout.continuous_offset


def test_meta_cache_roundtrip(tmp_path):
    cfg = db1_tiny()
    env = FakeContinuousEnv(obs_dim=4, act_dim=2, episode_len=6)
    store = TrajectoryStore.from_flat_dataset(env.make_dataset(3))
    ds1 = RLFullDataset("fake", store, _suite(cfg), seq_length=64,
                        cache_dir=str(tmp_path), use_prompt=False, seed=0)
    store.save_cache(str(tmp_path), "fake")
    # re-attach purely from disk
    lazy = TrajectoryStore.from_cache_dir(str(tmp_path), "fake")
    ds2 = RLFullDataset("fake", lazy, _suite(cfg), seq_length=64,
                        cache_dir=str(tmp_path), use_prompt=False, seed=0)
    assert ds2.transition_num == ds1.transition_num
    assert ds2.observation_dim == ds1.observation_dim
    s1, s2 = ds1.get(3), ds2.get(3)
    np.testing.assert_array_equal(s1["tokens"], s2["tokens"])
