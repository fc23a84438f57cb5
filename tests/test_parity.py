"""Logit parity: JAX model + converter vs the torch oracle implementing the
reference arithmetic (reference: src/model/transformer_xl.py). This is the
acceptance test for checkpoint conversion (SURVEY.md §5 checkpoint/resume)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from bdm_db1_tpu.core.config import db1_tiny
from bdm_db1_tpu.data.input_specs import RLTaskBatch
from bdm_db1_tpu.models.transformer_xl import TransformerXL
from bdm_db1_tpu.train.convert import convert_state_dict

from torch_oracle import OracleTXL


def _setup(pre_lnorm=False, same_length=True, untie_r=False):
    cfg = db1_tiny(pre_lnorm=pre_lnorm, same_length=same_length,
                   untie_r=untie_r)
    cfg.model.dtype = "float32"
    torch.manual_seed(0)
    oracle = OracleTXL(cfg.model, cfg.vocab, cfg.vision).eval()
    # randomize all weights so parity is non-trivial
    with torch.no_grad():
        for p in oracle.parameters():
            p.normal_(0.0, 0.05)
    sd = {k: v for k, v in oracle.state_dict().items()}
    params = convert_state_dict(sd, cfg)
    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    return cfg, oracle, model, params


@pytest.mark.parametrize("pre_lnorm", [False, True])
def test_logit_parity_no_mems(pre_lnorm):
    cfg, oracle, model, params = _setup(pre_lnorm=pre_lnorm)
    layout = cfg.vocab.layout()
    rng = np.random.RandomState(0)
    L = cfg.model.n_position
    tokens = rng.randint(0, layout.total_vocab_size, (2, L)).astype(np.int64)
    pos = rng.randint(0, 8, (2, L)).astype(np.int64)

    ref_logits, _ = oracle(torch.from_numpy(tokens), torch.from_numpy(pos))
    batch = {"rl": RLTaskBatch(tokens=jnp.asarray(tokens, jnp.int32),
                               position_id=jnp.asarray(pos, jnp.int32))}
    ours, _ = model.apply({"params": params}, batch, compute_loss=False)
    ours = np.asarray(ours)[:, :, : layout.total_vocab_size]
    np.testing.assert_allclose(ours, ref_logits.numpy(), rtol=2e-4, atol=2e-4)


def test_logit_parity_with_mems_multistep():
    cfg, oracle, model, params = _setup()
    layout = cfg.vocab.layout()
    rng = np.random.RandomState(1)

    t_mems = oracle.init_mem(1)
    j_mems = model.apply({"params": params}, 1, method=TransformerXL.init_mems)

    # several decode steps of varying qlen, exactly the eval inner loop
    for qlen in (7, 1, 1, 5, 1):
        tokens = rng.randint(0, layout.total_vocab_size, (1, qlen)).astype(np.int64)
        pos = rng.randint(0, 8, (1, qlen)).astype(np.int64)
        ref_logits, t_mems = oracle(
            torch.from_numpy(tokens), torch.from_numpy(pos), mems=t_mems)
        ours, j_mems = model.apply(
            {"params": params}, jnp.asarray(tokens, jnp.int32),
            jnp.asarray(pos, jnp.int32), j_mems, method=TransformerXL.decode_rl)
        np.testing.assert_allclose(
            np.asarray(ours)[0, : layout.total_vocab_size],
            ref_logits[0, -1].numpy(), rtol=3e-4, atol=3e-4)
        np.testing.assert_allclose(
            np.asarray(j_mems), np.stack([m.numpy() for m in t_mems]),
            rtol=3e-4, atol=3e-4)


def test_logit_parity_with_images():
    cfg, oracle, model, params = _setup()
    layout = cfg.vocab.layout()
    p = cfg.vision.patch_size
    H = W = 2 * p
    patches = 4
    T = 2
    step = patches + 1 + 1
    L = T * step
    rng = np.random.RandomState(2)

    tokens = np.zeros((1, L), dtype=np.int64)
    pos = np.zeros((1, L), dtype=np.int64)
    for t in range(T):
        tokens[0, t * step: t * step + patches] = -1
        tokens[0, t * step + patches] = layout.separator_id
        tokens[0, t * step + patches + 1] = layout.continuous_offset + 3
        pos[0, t * step: t * step + patches + 1] = 1 + np.arange(patches + 1)
    images_chw = rng.randn(1, T, 3, H, W).astype(np.float32)

    ref_logits, _ = oracle(
        torch.from_numpy(tokens), torch.from_numpy(pos),
        images=torch.from_numpy(images_chw))

    images_hwc = np.transpose(images_chw, (0, 1, 3, 4, 2))
    batch = {"rl": RLTaskBatch(tokens=jnp.asarray(tokens, jnp.int32),
                               position_id=jnp.asarray(pos, jnp.int32),
                               images=jnp.asarray(images_hwc))}
    ours, _ = model.apply({"params": params}, batch, compute_loss=False)
    ours = np.asarray(ours)[:, :, : layout.total_vocab_size]
    np.testing.assert_allclose(ours, ref_logits.numpy(), rtol=5e-4, atol=5e-4)


def test_untie_r_parity():
    cfg, oracle, model, params = _setup(untie_r=True)
    layout = cfg.vocab.layout()
    rng = np.random.RandomState(3)
    tokens = rng.randint(0, layout.total_vocab_size, (1, 16)).astype(np.int64)
    pos = np.zeros((1, 16), dtype=np.int64)
    ref_logits, _ = oracle(torch.from_numpy(tokens), torch.from_numpy(pos))
    batch = {"rl": RLTaskBatch(tokens=jnp.asarray(tokens, jnp.int32),
                               position_id=jnp.asarray(pos, jnp.int32))}
    ours, _ = model.apply({"params": params}, batch, compute_loss=False)
    np.testing.assert_allclose(
        np.asarray(ours)[:, :, : layout.total_vocab_size],
        ref_logits.numpy(), rtol=2e-4, atol=2e-4)
