"""DeepSpeed checkpoint-DIRECTORY resolution, end to end.

The production eval driver resolves and converts a torch checkpoint dir on
the fly (eval/evaluate_rl.py load_params -> train/convert.py
find_deepspeed_model_states/load_torch_state_dict) — the road to the
north-star parity number. The reference loads the same layout through the
DeepSpeed engine (reference: src/evaluation/evaluate_rl.py:509-511,
``model_engine.load_checkpoint(load_dir, tag)``; saved by
src/checkpointing.py:17-22 as ``<dir>/<tag>/mp_rank_00_model_states.pt``
with the weights under the ``module`` key). These tests synthesize that
directory from the torch oracle's state dict and walk the whole branch.
"""

import numpy as np
import pytest
import torch

torch.manual_seed(0)

from bdm_db1_tpu.core.config import db1_tiny
from bdm_db1_tpu.train.convert import (
    convert_state_dict, find_deepspeed_model_states, load_torch_state_dict,
)

from torch_oracle import OracleTXL


def _oracle_and_sd():
    cfg = db1_tiny()
    cfg.model.dtype = "float32"
    torch.manual_seed(3)
    oracle = OracleTXL(cfg.model, cfg.vocab, cfg.vision).eval()
    with torch.no_grad():
        for p in oracle.parameters():
            p.normal_(0.0, 0.05)
    return cfg, {k: v for k, v in oracle.state_dict().items()}


def _write_engine_ckpt(tmp_path, tag, sd, prefix="", subdir=""):
    """DeepSpeed engine layout: <dir>/<tag>/mp_rank_00_model_states.pt with
    the model weights under 'module' (optionally 'module.'-prefixed names,
    as the engine emits for wrapped modules)."""
    d = tmp_path / tag / subdir if subdir else tmp_path / tag
    d.mkdir(parents=True, exist_ok=True)
    obj = {
        "module": {prefix + k: v.clone() for k, v in sd.items()},
        "optimizer": None,
        "global_steps": 7,
        "client_state": {"iteration": 7},
    }
    path = d / "mp_rank_00_model_states.pt"
    torch.save(obj, path)
    return path


def test_find_and_load_engine_state(tmp_path):
    cfg, sd = _oracle_and_sd()
    tag = "db1_870task_checkpoint"
    _write_engine_ckpt(tmp_path, tag, sd, prefix="module.")

    found = find_deepspeed_model_states(str(tmp_path), tag)
    assert found.endswith("mp_rank_00_model_states.pt")
    loaded = load_torch_state_dict(found)
    # the 'module' unwrap + 'module.' name-prefix strip both happened
    assert set(loaded) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(loaded[k], sd[k].numpy())


def test_find_walks_nested_layout(tmp_path):
    """Some DeepSpeed versions nest the states file one level deeper; the
    resolver walks the tag dir for *model_states.pt."""
    cfg, sd = _oracle_and_sd()
    _write_engine_ckpt(tmp_path, "tag", sd, subdir="global_step7")
    found = find_deepspeed_model_states(str(tmp_path), "tag")
    assert "global_step7" in found
    with pytest.raises(FileNotFoundError):
        find_deepspeed_model_states(str(tmp_path), "missing-tag")


def test_load_params_converts_deepspeed_dir(tmp_path):
    """eval/evaluate_rl.load_params on a synthesized DeepSpeed dir equals
    convert_state_dict applied directly, down to greedy-action parity
    through the ring decoder."""
    import jax

    from bdm_db1_tpu.data.rl_dataset import (
        RLFullDataset, RLTokenizerSuite, TrajectoryStore,
    )
    from bdm_db1_tpu.eval.decode import build_decoder_for_env
    from bdm_db1_tpu.eval.envs import FakeContinuousEnv
    from bdm_db1_tpu.eval.evaluate_rl import load_params
    from bdm_db1_tpu.eval.wrapper import TokenizedEnv
    from bdm_db1_tpu.models.transformer_xl import TransformerXL
    from bdm_db1_tpu.tokenizers.scalar import ScalarTokenizer
    from bdm_db1_tpu.tokenizers.text import ByteTextTokenizer

    cfg, sd = _oracle_and_sd()
    tag = "db1_870task_checkpoint"
    _write_engine_ckpt(tmp_path, tag, sd)
    cfg.train.load_dir = str(tmp_path)
    cfg.train.ckpt_tag = tag

    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    params_dir = load_params(cfg, model)          # the production branch
    params_direct = convert_state_dict(
        {k: v.numpy() for k, v in sd.items()}, cfg)

    flat_a = jax.tree_util.tree_leaves_with_path(params_dir)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(params_direct))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[path]), err_msg=str(path))

    # greedy-action parity through the decoder (the acceptance criterion,
    # reference: evaluate_rl.py:205 greedy argmax)
    env = FakeContinuousEnv(obs_dim=4, act_dim=2, episode_len=6, seed=0)
    layout = cfg.vocab.layout()
    suite = RLTokenizerSuite(
        layout, ScalarTokenizer(cfg.vocab.num_continuous_bin),
        ByteTextTokenizer(), vision_patch_size=cfg.vision.patch_size)
    store = TrajectoryStore.from_flat_dataset(env.make_dataset(3))
    ds = RLFullDataset("ckpt-parity", store, suite,
                       seq_length=cfg.model.n_position, seed=0)
    te = TokenizedEnv(env, ds)
    obs_tok, _, _ = te.reset()
    prime = np.concatenate([obs_tok, [te.separator_id]])

    acts = []
    for params in (params_dir, params_direct):
        dec = build_decoder_for_env(model, params, te)
        act, _ = dec.decode(prime, dec.init_mems(1))
        acts.append(np.asarray(act))
    np.testing.assert_array_equal(acts[0], acts[1])
