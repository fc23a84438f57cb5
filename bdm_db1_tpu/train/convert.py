"""Torch/DeepSpeed checkpoint -> JAX parameter tree converter.

The reference persists fp16 torch state dicts through the DeepSpeed engine
(reference: src/checkpointing.py:17-22; load at
src/evaluation/evaluate_rl.py:509-511, tag ``db1_870task_checkpoint``).
This module maps those tensors onto our flax layout:

* per-layer weights stack along a leading layer axis (nn.scan layout);
* torch ``Linear.weight`` is [out, in] -> flax ``kernel`` is [in, out];
* torch conv weights are OIHW -> flax HWIO;
* the embedding table pads to ``padded_vocab_size`` with zero rows;
* everything is upcast to fp32 master params.

Torch is only needed to *read* checkpoints; conversion itself is numpy.
"""

from __future__ import annotations

import os
from typing import Dict, Mapping

import numpy as np

from bdm_db1_tpu.core.config import DB1Config


def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear weight [out, in] -> flax kernel [in, out]."""
    return np.ascontiguousarray(w.T)


def _conv(w: np.ndarray) -> np.ndarray:
    """torch conv OIHW -> flax HWIO."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x, dtype=np.float32)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch/DeepSpeed checkpoint file into numpy.

    Accepts either a raw ``state_dict`` file or a DeepSpeed engine state
    (``module`` key), e.g. ``<dir>/<tag>/mp_rank_00_model_states.pt``.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "module" in obj and isinstance(obj["module"], dict):
        obj = obj["module"]
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if hasattr(v, "numel"):
            out[k.replace("module.", "", 1) if k.startswith("module.") else k] = _np(v)
    return out


def find_deepspeed_model_states(load_dir: str, tag: str) -> str:
    cand = os.path.join(load_dir, tag, "mp_rank_00_model_states.pt")
    if os.path.exists(cand):
        return cand
    for root, _, files in os.walk(os.path.join(load_dir, tag)):
        for f in files:
            if f.endswith("model_states.pt"):
                return os.path.join(root, f)
    raise FileNotFoundError(f"no model_states.pt under {load_dir}/{tag}")


def convert_state_dict(sd: Mapping[str, np.ndarray], cfg: DB1Config) -> dict:
    """Reference torch parameter names -> flax param pytree (pure numpy)."""
    m = cfg.model
    layout = cfg.vocab.layout()
    L = m.n_layer

    def stack(fmt: str, f=lambda x: x) -> np.ndarray:
        return np.stack([f(_np(sd[fmt.format(i=i)])) for i in range(L)], axis=0)

    # --- embeddings ------------------------------------------------------
    emb = _np(sd["word_embedding.weight"])
    assert emb.shape[0] == layout.total_vocab_size, (
        emb.shape, layout.total_vocab_size)
    pad = layout.padded_vocab_size - emb.shape[0]
    if pad:
        emb = np.concatenate([emb, np.zeros((pad, emb.shape[1]), emb.dtype)], 0)

    params: dict = {
        "word_embedding": {"embedding": emb},
        "rl_timestep_embedding": {
            "embedding": _np(sd["rl_local_timestep_embedding.weight"])
        },
    }

    # --- shared relative-position biases -----------------------------------
    if not m.untie_r:
        params["r_w_bias"] = _np(sd["r_w_bias"])
        params["r_r_bias"] = _np(sd["r_r_bias"])

    # --- decoder layers (scan-stacked) -------------------------------------
    attn = {
        "qkv_net": {"kernel": stack("h.{i}.dec_attn.qkv_net.weight", _t)},
        "r_net": {"kernel": stack("h.{i}.dec_attn.r_net.weight", _t)},
        "o_net": {"kernel": stack("h.{i}.dec_attn.o_net.weight", _t)},
        "layer_norm": {
            "scale": stack("h.{i}.dec_attn.layer_norm.weight"),
            "bias": stack("h.{i}.dec_attn.layer_norm.bias"),
        },
    }
    if m.untie_r:
        attn["r_w_bias"] = stack("h.{i}.dec_attn.r_w_bias")
        attn["r_r_bias"] = stack("h.{i}.dec_attn.r_r_bias")
    ff = {
        "wi": {
            "kernel": stack("h.{i}.pos_ff.CoreNet.0.weight", _t),
            "bias": stack("h.{i}.pos_ff.CoreNet.0.bias"),
        },
        "wo": {
            "kernel": stack("h.{i}.pos_ff.CoreNet.2.weight", _t),
            "bias": stack("h.{i}.pos_ff.CoreNet.2.bias"),
        },
        "layer_norm": {
            "scale": stack("h.{i}.pos_ff.layer_norm.weight"),
            "bias": stack("h.{i}.pos_ff.layer_norm.bias"),
        },
    }
    params["layers"] = {"attn": attn, "ff": ff}

    # --- vision encoder -------------------------------------------------------
    vp = "vision_encoder.patch_embeddings."
    if vp + "conv1.weight" in sd:
        patch = {
            "conv_in": {"kernel": _conv(_np(sd[vp + "conv1.weight"])),
                        "bias": _np(sd[vp + "conv1.bias"])},
            "gn1": {"scale": _np(sd[vp + "residual_path.0.weight"]),
                    "bias": _np(sd[vp + "residual_path.0.bias"])},
            "conv_mid1": {"kernel": _conv(_np(sd[vp + "residual_path.2.weight"])),
                          "bias": _np(sd[vp + "residual_path.2.bias"])},
            "gn2": {"scale": _np(sd[vp + "residual_path.3.weight"]),
                    "bias": _np(sd[vp + "residual_path.3.bias"])},
            "conv_mid2": {"kernel": _conv(_np(sd[vp + "residual_path.5.weight"])),
                          "bias": _np(sd[vp + "residual_path.5.bias"])},
            "projection": {"kernel": _conv(_np(sd[vp + "projection.weight"])),
                           "bias": _np(sd[vp + "projection.bias"])},
        }
        params["vision"] = {
            "patch": patch,
            "row_pos": {"embedding": _np(
                sd["vision_encoder.row_position_embeddings.weight"])},
            "col_pos": {"embedding": _np(
                sd["vision_encoder.col_position_embeddings.weight"])},
        }

    if not m.share_input_output_embedding and "lm_head.weight" in sd:
        head = _t(_np(sd["lm_head.weight"]))
        padc = layout.padded_vocab_size - head.shape[1]
        if padc:
            head = np.concatenate(
                [head, np.zeros((head.shape[0], padc), head.dtype)], 1)
        params["lm_head"] = {"kernel": head}

    return params


def convert_checkpoint(load_dir: str, tag: str, cfg: DB1Config) -> dict:
    """End-to-end: DeepSpeed checkpoint dir -> flax params."""
    sd = load_torch_state_dict(find_deepspeed_model_states(load_dir, tag))
    return convert_state_dict(sd, cfg)


def invert_state_dict(params: Mapping, cfg: DB1Config
                      ) -> Dict[str, np.ndarray]:
    """Flax param pytree -> reference torch parameter names (numpy fp32).

    The exact inverse of :func:`convert_state_dict` (vocab pad rows
    stripped, kernels transposed back to [out, in], conv HWIO -> OIHW,
    scan-stacked layers unstacked). Used to SYNTHESIZE a
    reference-format DeepSpeed checkpoint at any geometry — the
    flagship cold-path rehearsal (scripts/ckpt_rehearsal.py) and the
    round-trip test (tests/test_checkpoint.py) both need one without
    downloading the released 1.2B
    (reference format: src/checkpointing.py:17-22)."""
    from flax import linen as nn

    params = nn.meta.unbox(params)
    m = cfg.model
    layout = cfg.vocab.layout()
    L = m.n_layer
    g = lambda *ks: _np(_walk(params, ks))
    sd: Dict[str, np.ndarray] = {
        "word_embedding.weight":
            g("word_embedding", "embedding")[:layout.total_vocab_size],
        "rl_local_timestep_embedding.weight":
            g("rl_timestep_embedding", "embedding"),
        # sinusoidal inv-freq buffer (reference transformer_xl.py:34-50;
        # not learned — reconstructed analytically)
        "pos_emb.inv_freq": (
            1.0 / (10000.0 ** (np.arange(0.0, m.n_embed, 2.0) / m.n_embed))
        ).astype(np.float32),
    }
    if not m.untie_r:
        sd["r_w_bias"] = g("r_w_bias")
        sd["r_r_bias"] = g("r_r_bias")
        # the reference shares ONE (r_w, r_r) pair across layers; torch
        # state_dicts still list the shared tensor under every layer
        for i in range(L):
            sd[f"h.{i}.dec_attn.r_w_bias"] = sd["r_w_bias"]
            sd[f"h.{i}.dec_attn.r_r_bias"] = sd["r_r_bias"]

    def unstack(fmt: str, arr: np.ndarray, f=lambda x: x) -> None:
        assert arr.shape[0] == L, (fmt, arr.shape)
        for i in range(L):
            sd[fmt.format(i=i)] = f(arr[i])

    attn = _walk(params, ("layers", "attn"))
    unstack("h.{i}.dec_attn.qkv_net.weight", _np(attn["qkv_net"]["kernel"]),
            _t)
    unstack("h.{i}.dec_attn.r_net.weight", _np(attn["r_net"]["kernel"]), _t)
    unstack("h.{i}.dec_attn.o_net.weight", _np(attn["o_net"]["kernel"]), _t)
    unstack("h.{i}.dec_attn.layer_norm.weight",
            _np(attn["layer_norm"]["scale"]))
    unstack("h.{i}.dec_attn.layer_norm.bias",
            _np(attn["layer_norm"]["bias"]))
    if m.untie_r:
        unstack("h.{i}.dec_attn.r_w_bias", _np(attn["r_w_bias"]))
        unstack("h.{i}.dec_attn.r_r_bias", _np(attn["r_r_bias"]))
    ff = _walk(params, ("layers", "ff"))
    unstack("h.{i}.pos_ff.CoreNet.0.weight", _np(ff["wi"]["kernel"]), _t)
    unstack("h.{i}.pos_ff.CoreNet.0.bias", _np(ff["wi"]["bias"]))
    unstack("h.{i}.pos_ff.CoreNet.2.weight", _np(ff["wo"]["kernel"]), _t)
    unstack("h.{i}.pos_ff.CoreNet.2.bias", _np(ff["wo"]["bias"]))
    unstack("h.{i}.pos_ff.layer_norm.weight", _np(ff["layer_norm"]["scale"]))
    unstack("h.{i}.pos_ff.layer_norm.bias", _np(ff["layer_norm"]["bias"]))

    if "vision" in params:
        patch = _walk(params, ("vision", "patch"))
        vp = "vision_encoder.patch_embeddings."

        def inv_conv(w):
            return np.ascontiguousarray(np.transpose(_np(w), (3, 2, 0, 1)))

        sd[vp + "conv1.weight"] = inv_conv(patch["conv_in"]["kernel"])
        sd[vp + "conv1.bias"] = _np(patch["conv_in"]["bias"])
        sd[vp + "residual_path.0.weight"] = _np(patch["gn1"]["scale"])
        sd[vp + "residual_path.0.bias"] = _np(patch["gn1"]["bias"])
        sd[vp + "residual_path.2.weight"] = inv_conv(
            patch["conv_mid1"]["kernel"])
        sd[vp + "residual_path.2.bias"] = _np(patch["conv_mid1"]["bias"])
        sd[vp + "residual_path.3.weight"] = _np(patch["gn2"]["scale"])
        sd[vp + "residual_path.3.bias"] = _np(patch["gn2"]["bias"])
        sd[vp + "residual_path.5.weight"] = inv_conv(
            patch["conv_mid2"]["kernel"])
        sd[vp + "residual_path.5.bias"] = _np(patch["conv_mid2"]["bias"])
        sd[vp + "projection.weight"] = inv_conv(patch["projection"]["kernel"])
        sd[vp + "projection.bias"] = _np(patch["projection"]["bias"])
        sd["vision_encoder.row_position_embeddings.weight"] = g(
            "vision", "row_pos", "embedding")
        sd["vision_encoder.col_position_embeddings.weight"] = g(
            "vision", "col_pos", "embedding")

    if not m.share_input_output_embedding and "lm_head" in params:
        head = _np(params["lm_head"]["kernel"])  # [d, padded]
        sd["lm_head.weight"] = _t(head[:, :layout.total_vocab_size])
    return sd


def _walk(tree, keys):
    for k in keys:
        tree = tree[k]
    return tree


def save_deepspeed_checkpoint(params: Mapping, cfg: DB1Config,
                              load_dir: str, tag: str,
                              dtype: str = "float16") -> str:
    """Write ``<load_dir>/<tag>/mp_rank_00_model_states.pt`` in the
    reference's DeepSpeed engine layout (fp16 tensors under "module"),
    from a flax param tree. Returns the file path."""
    import torch

    sd = invert_state_dict(params, cfg)
    tdt = getattr(torch, dtype)
    module = {k: torch.from_numpy(np.ascontiguousarray(v)).to(tdt)
              for k, v in sd.items()}
    out_dir = os.path.join(load_dir, tag)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "mp_rank_00_model_states.pt")
    torch.save({"module": module}, path)
    return path


def main(argv=None) -> None:
    """CLI: convert a DeepSpeed checkpoint to an orbax checkpoint dir.

    python -m bdm_db1_tpu.train.convert --load-dir /ckpts \
        --tag db1_870task_checkpoint --output /ckpts_tpu [--config cfg.json]
    """
    import argparse

    ap = argparse.ArgumentParser("convert")
    ap.add_argument("--load-dir", required=True)
    ap.add_argument("--tag", default="db1_870task_checkpoint")
    ap.add_argument("--output", required=True)
    ap.add_argument("--config", default=None,
                    help="DB1Config json; default: the 1.2B flagship")
    args = ap.parse_args(argv)

    from bdm_db1_tpu.core.config import db1_1p2b

    cfg = (DB1Config.from_json(args.config) if args.config else db1_1p2b())
    params = convert_checkpoint(args.load_dir, args.tag, cfg)
    n = int(sum(np.prod(v.shape) for v in
                __import__("jax").tree.leaves(params)))
    print(f"converted {n:,} parameters")

    from bdm_db1_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(args.output)
    mgr.save(0, {"params": params},
             client_state={"source": f"{args.load_dir}/{args.tag}",
                           "iteration": 0})
    mgr.wait()
    mgr.close()
    print(f"wrote orbax checkpoint to {args.output}/0")


if __name__ == "__main__":
    main()
