"""Golden-vector tests for the vocab layout, derived from the reference's
offset arithmetic (reference: src/data/rl_dataset.py:412-471,683-685;
src/evaluation/rl/wrapper.py:53-60; src/evaluation/evaluate_rl.py:96-138)."""

import numpy as np

from bdm_db1_tpu.core.vocab import VocabLayout


def test_flagship_layout_overlap():
    v = VocabLayout(32_000, 1_024, 1_024, overlap_with_text=True)
    assert v.discrete_offset == 0
    assert v.continuous_offset == 32_000
    assert v.separator_id == 33_024
    assert v.total_vocab_size == 33_025
    assert v.padded_vocab_size == 33_152  # 259 * 128
    assert v.padded_vocab_size % 128 == 0


def test_layout_no_overlap():
    v = VocabLayout(32_000, 1_024, 1_024, overlap_with_text=False)
    assert v.discrete_offset == 32_000
    assert v.continuous_offset == 33_024
    assert v.separator_id == 34_048
    assert v.total_vocab_size == 34_049


def test_roundtrip_maps():
    for overlap in (True, False):
        v = VocabLayout(100, 16, 32, overlap_with_text=overlap)
        bins = np.arange(32)
        toks = v.encode_continuous(bins)
        assert toks.min() >= v.continuous_offset
        assert toks.max() < v.separator_id
        np.testing.assert_array_equal(v.decode_continuous(toks), bins)
        vals = np.arange(16)
        np.testing.assert_array_equal(v.decode_discrete(v.encode_discrete(vals)), vals)


def test_continuous_action_bias_matches_reference_masking():
    # reference bans [0, text) (overlap) plus the separator for continuous
    # actions (evaluate_rl.py:105-110)
    v = VocabLayout(100, 16, 32, overlap_with_text=True)
    bias = v.continuous_action_logit_bias()
    assert (bias[:100] < 0).all()            # text banned
    assert (bias[100:132] == 0).all()        # continuous bins allowed
    assert bias[v.separator_id] < 0          # separator banned
    assert (bias[v.total_vocab_size:] < 0).all()  # padding tail banned


def test_discrete_action_bias():
    v = VocabLayout(100, 16, 32, overlap_with_text=True)
    bias = v.discrete_action_logit_bias(num_actions=5)
    assert (bias[:5] == 0).all()
    assert (bias[5:] < 0).all()

    v2 = VocabLayout(100, 16, 32, overlap_with_text=False)
    bias2 = v2.discrete_action_logit_bias(num_actions=5)
    assert (bias2[100:105] == 0).all()
    assert (bias2[:100] < 0).all() and (bias2[105:] < 0).all()
