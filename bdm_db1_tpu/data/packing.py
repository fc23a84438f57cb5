"""Gato transition packing: trajectory tokens -> fixed-shape training samples.

Replaces the reference's per-sample Python loops
(reference: src/data/rl_dataset.py:44-71, 614-752) with vectorized numpy that
produces the identical layout:

    [obs_tokens(obs_len) | separator | action_tokens(act_len)] per transition,
    flattened, then split into (input=tokens[:-1], label=tokens[1:]).

Per-position metadata:
    * ``position_id`` — local timestep id: 1..obs_len+1 over obs+separator,
      0 at action slots (feeds the RL local-timestep embedding,
      reference: src/model/transformer_xl.py:406-407, 646-649).
    * ``action_flag`` — loss mask: 1 at action-token positions outside the
      prepended prompt region.

Image observations occupy ``-1`` placeholder ids; the model splices patch
embeddings there (reference: src/model/transformer_xl.py:630-642).
"""

from __future__ import annotations

import numpy as np

IMAGE_PLACEHOLDER = -1


def action_flags_and_position_ids(
    seq_length: int, obs_len: int, act_len: int, prepend_trans_num: int = 0
):
    """Vectorized equivalent of the reference flag/position builder
    (reference: src/data/rl_dataset.py:44-71). Assumes the sequence starts
    at a transition boundary."""
    step = obs_len + act_len + 1
    idx = np.arange(seq_length, dtype=np.int64)
    within = idx % step
    position_id = np.where(within <= obs_len, 1 + within, 0).astype(np.int64)
    action_flag = (
        (within > obs_len) & (idx >= prepend_trans_num * step)
    ).astype(np.int64)
    return action_flag, position_id


def pack_transitions(
    obs_tokens: np.ndarray,
    act_tokens: np.ndarray,
    separator_id: int,
) -> np.ndarray:
    """[T, obs_len] obs tokens + [T, act_len] action tokens ->
    flattened [T * (obs_len + 1 + act_len)] token stream."""
    T = obs_tokens.shape[0]
    assert act_tokens.shape[0] == T
    sep = np.full((T, 1), separator_id, dtype=np.int64)
    joined = np.concatenate(
        [obs_tokens.astype(np.int64), sep, act_tokens.astype(np.int64)], axis=1
    )
    return joined.reshape(-1)


def truncate_or_pad(arr: np.ndarray, length: int, pad_value=0) -> np.ndarray:
    """Match the reference's fixed-length behavior
    (reference: src/data/rl_dataset.py:865-872): truncate the tail or pad."""
    if len(arr) > length:
        return arr[:length]
    if len(arr) < length:
        pad = np.full((length - len(arr),) + arr.shape[1:], pad_value, arr.dtype)
        return np.concatenate([arr, pad], axis=0)
    return arr


def build_rl_sample(
    obs_tokens: np.ndarray,
    act_tokens: np.ndarray,
    separator_id: int,
    target_seq_len: int,
    prepend_trans_num: int = 0,
    valid_trans_num: int | None = None,
):
    """Full sample construction (reference: src/data/rl_dataset.py:687-746).

    Returns dict with ``tokens``/``label``/``loss_mask``/``position_id``
    each of length ``target_seq_len`` (tokens/labels split from a length
    ``target_seq_len + 1`` stream).
    """
    T, obs_len = obs_tokens.shape
    act_len = act_tokens.shape[1]
    joined = pack_transitions(obs_tokens, act_tokens, separator_id)
    action_flag, position_id = action_flags_and_position_ids(
        len(joined), obs_len, act_len, prepend_trans_num
    )
    if valid_trans_num is not None and valid_trans_num < T:
        # transitions past the true trajectory end contribute no loss
        # (reference: src/data/rl_dataset.py:706-707)
        step = obs_len + act_len + 1
        action_flag[valid_trans_num * step:] = 0

    L = target_seq_len + 1
    joined = truncate_or_pad(joined, L)
    action_flag = truncate_or_pad(action_flag, L)
    position_id = truncate_or_pad(position_id, L)
    return {
        "tokens": joined[:-1],
        "label": joined[1:],
        "loss_mask": action_flag[1:],
        "position_id": position_id[:-1],
    }
