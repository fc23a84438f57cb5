"""Packing tests: the vectorized flag/position builder must agree with the
reference's loop implementation (reference: src/data/rl_dataset.py:44-71)."""

import numpy as np
import pytest

from bdm_db1_tpu.data.packing import (
    action_flags_and_position_ids,
    build_rl_sample,
    pack_transitions,
)


def _reference_flags(index_l, index_r, obs_seq_len, act_seq_len, prepend_trans_num):
    """Loop oracle mirroring the reference builder."""
    seq_length = index_r - index_l + 1
    action_flag = np.zeros((seq_length,), dtype=np.int64)
    position_id = np.zeros_like(action_flag)
    step = obs_seq_len + act_seq_len + 1
    prepend_len = prepend_trans_num * step
    for i in range(0, seq_length, step):
        n = min(obs_seq_len + 1, seq_length - i)
        position_id[i: i + obs_seq_len + 1] = 1 + np.arange(n)
    for i in range(prepend_len, seq_length, step):
        action_flag[i + obs_seq_len + 1: min(seq_length, i + step)] = 1
    return action_flag, position_id


@pytest.mark.parametrize("obs_len,act_len,prepend", [
    (17, 6, 0), (17, 6, 3), (4, 1, 0), (4, 1, 2), (100, 8, 1),
])
@pytest.mark.parametrize("seq_len", [23, 24, 25, 100, 1025])
def test_flags_match_reference_loop(obs_len, act_len, prepend, seq_len):
    ours_flag, ours_pos = action_flags_and_position_ids(
        seq_len, obs_len, act_len, prepend)
    ref_flag, ref_pos = _reference_flags(0, seq_len - 1, obs_len, act_len, prepend)
    np.testing.assert_array_equal(ours_flag, ref_flag)
    np.testing.assert_array_equal(ours_pos, ref_pos)


def test_pack_layout():
    obs = np.arange(12).reshape(3, 4)          # 3 transitions, obs_len 4
    act = 100 + np.arange(6).reshape(3, 2)     # act_len 2
    sep = 999
    packed = pack_transitions(obs, act, sep)
    expect = np.array([0, 1, 2, 3, 999, 100, 101,
                       4, 5, 6, 7, 999, 102, 103,
                       8, 9, 10, 11, 999, 104, 105])
    np.testing.assert_array_equal(packed, expect)


def test_build_rl_sample_shapes_and_shift():
    obs = np.arange(40).reshape(8, 5)
    act = 50 + np.arange(16).reshape(8, 2)
    out = build_rl_sample(obs, act, separator_id=77, target_seq_len=30)
    assert out["tokens"].shape == (30,)
    assert out["label"].shape == (30,)
    # next-token shift: label[i] == tokens[i+1]
    packed = pack_transitions(obs, act, 77)
    np.testing.assert_array_equal(out["tokens"], packed[:30])
    np.testing.assert_array_equal(out["label"], packed[1:31])
    # loss only on action positions
    flags, _ = action_flags_and_position_ids(len(packed), 5, 2, 0)
    np.testing.assert_array_equal(out["loss_mask"], flags[1:31])


def test_build_rl_sample_valid_trans_masking():
    obs = np.zeros((4, 3), dtype=np.int64)
    act = np.zeros((4, 1), dtype=np.int64)
    out = build_rl_sample(obs, act, separator_id=9, target_seq_len=19,
                          valid_trans_num=2)
    step = 3 + 1 + 1
    # actions of transitions >= 2 carry no loss (label index shift by 1)
    assert out["loss_mask"][2 * step:].sum() == 0
    assert out["loss_mask"].sum() == 2  # one action token per valid transition


def test_padding_when_short():
    obs = np.ones((2, 3), dtype=np.int64)
    act = np.ones((2, 1), dtype=np.int64)
    out = build_rl_sample(obs, act, separator_id=9, target_seq_len=40)
    assert out["tokens"].shape == (40,)
    assert (out["tokens"][10:] == 0).all()
    assert (out["loss_mask"][10:] == 0).all()
