"""Model-level tests on a tiny TransformerXL: shapes, loss, causality,
image splicing, and the segment-memory decode path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bdm_db1_tpu.core.config import db1_tiny
from bdm_db1_tpu.data.input_specs import NLPTaskBatch, RLTaskBatch
from bdm_db1_tpu.models.transformer_xl import TransformerXL


@pytest.fixture(scope="module")
def tiny():
    cfg = db1_tiny()
    cfg.model.dtype = "float32"  # CPU tests in fp32
    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    layout = cfg.vocab.layout()
    rng = jax.random.PRNGKey(0)
    tokens = jax.random.randint(rng, (2, cfg.model.n_position), 0,
                                layout.total_vocab_size, dtype=jnp.int32)
    batch = {
        "nlp": NLPTaskBatch(tokens=tokens, loss_mask=jnp.ones_like(tokens),
                            label=tokens),
        "rl": RLTaskBatch(tokens=tokens, position_id=jnp.zeros_like(tokens),
                          loss_mask=jnp.ones_like(tokens), label=tokens),
    }
    params = model.init(rng, batch, compute_loss=True)["params"]
    return cfg, model, params, layout


def test_forward_shapes_and_loss(tiny):
    cfg, model, params, layout = tiny
    L = cfg.model.n_position
    tokens = jnp.arange(2 * L, dtype=jnp.int32).reshape(2, L) % layout.total_vocab_size
    batch = {"nlp": NLPTaskBatch(tokens=tokens, loss_mask=jnp.ones_like(tokens),
                                 label=tokens)}
    logits, loss = model.apply({"params": params}, batch)
    assert logits.shape == (2, L, layout.padded_vocab_size)
    assert logits.dtype == jnp.float32
    assert jnp.isfinite(loss)


def test_causality(tiny):
    cfg, model, params, layout = tiny
    L = cfg.model.n_position
    rng = np.random.RandomState(0)
    base = rng.randint(0, layout.total_vocab_size, size=(1, L)).astype(np.int32)
    perturbed = base.copy()
    cut = L // 2
    perturbed[0, cut:] = rng.randint(0, layout.total_vocab_size, size=L - cut)

    def logits_of(t):
        b = {"nlp": NLPTaskBatch(tokens=jnp.asarray(t))}
        out, _ = model.apply({"params": params}, b, compute_loss=False)
        return np.asarray(out)

    la, lb = logits_of(base), logits_of(perturbed)
    np.testing.assert_allclose(la[0, :cut], lb[0, :cut], rtol=2e-4, atol=2e-4)
    assert np.abs(la[0, cut:] - lb[0, cut:]).max() > 1e-3


def test_rl_with_images_splice(tiny):
    cfg, model, params, layout = tiny
    p = cfg.vision.patch_size
    H = W = 2 * p               # 4 patches per image
    T = 2                       # transitions with one image obs each
    patches = (H // p) * (W // p)
    obs_len, act_len = patches, 1
    step = obs_len + 1 + act_len
    L = T * step

    tokens = np.zeros((1, L), dtype=np.int32)
    pos = np.zeros((1, L), dtype=np.int32)
    for t in range(T):
        tokens[0, t * step: t * step + obs_len] = -1      # image slots
        tokens[0, t * step + obs_len] = layout.separator_id
        tokens[0, t * step + obs_len + 1] = layout.continuous_offset + 5
        pos[0, t * step: t * step + obs_len + 1] = 1 + np.arange(obs_len + 1)
    images = np.random.RandomState(0).randn(1, T, H, W, 3).astype(np.float32)

    batch = {"rl": RLTaskBatch(
        tokens=jnp.asarray(tokens), position_id=jnp.asarray(pos),
        images=jnp.asarray(images),
        loss_mask=jnp.asarray((tokens == -1) * 0 + (pos == 0), jnp.float32),
        label=jnp.maximum(jnp.asarray(tokens), 0),
    )}
    # re-init: rl/vision params were not created by the nlp-only init
    params2 = model.init(jax.random.PRNGKey(1), batch, compute_loss=True)["params"]
    logits, loss = model.apply({"params": params2}, batch)
    assert jnp.isfinite(loss)
    assert jnp.isfinite(logits).all()

    # image contents must change logits at/after the spliced slots
    # (note: per-patch normalization nulls affine shifts, so perturb with noise)
    images2 = images + np.random.RandomState(7).randn(*images.shape).astype(np.float32)
    batch2 = {"rl": batch["rl"].replace(images=jnp.asarray(images2))}
    logits2, _ = model.apply({"params": params2}, batch2)
    assert np.abs(np.asarray(logits2) - np.asarray(logits)).max() > 1e-4


def test_decode_with_mems(tiny):
    cfg, model, params, layout = tiny
    mems = model.apply({"params": params}, 1, method=TransformerXL.init_mems)
    assert mems.shape == (cfg.model.n_layer, 1, cfg.model.mem_len,
                          cfg.model.n_embed)
    tokens = jnp.array([[5, 6, 7]], dtype=jnp.int32)
    pos = jnp.array([[1, 2, 0]], dtype=jnp.int32)
    logits, new_mems = model.apply(
        {"params": params}, tokens, pos, mems, method=TransformerXL.decode_rl)
    assert logits.shape == (1, layout.padded_vocab_size)
    assert new_mems.shape == mems.shape
    # memory slides: the last 3 slots now hold fresh (non-zero) hiddens
    assert not np.allclose(np.asarray(new_mems[:, :, -3:, :]), 0.0)
    # one more single-token step
    logits2, mems2 = model.apply(
        {"params": params}, jnp.array([[9]], jnp.int32),
        jnp.array([[0]], jnp.int32), new_mems, method=TransformerXL.decode_rl)
    assert logits2.shape == (1, layout.padded_vocab_size)
    assert mems2.shape == mems.shape


def test_mixed_modality_batch(tiny):
    cfg, model, params, layout = tiny
    L = cfg.model.n_position
    rl_tokens = jnp.ones((2, L), jnp.int32)
    nlp_tokens = jnp.ones((3, L), jnp.int32) * 2
    batch = {
        "rl": RLTaskBatch(tokens=rl_tokens,
                          position_id=jnp.zeros_like(rl_tokens),
                          loss_mask=jnp.ones_like(rl_tokens),
                          label=rl_tokens),
        "nlp": NLPTaskBatch(tokens=nlp_tokens,
                            loss_mask=jnp.ones_like(nlp_tokens),
                            label=nlp_tokens),
    }
    params2 = model.init(jax.random.PRNGKey(2), batch, compute_loss=True)["params"]
    logits, loss = model.apply({"params": params2}, batch)
    assert logits.shape == (5, L, layout.padded_vocab_size)
    assert jnp.isfinite(loss)


def test_rel_shift_sliced_matches_on_valid_region():
    """rel_shift_sliced == rel_shift wherever attention can look (row i,
    cols j <= mlen + i); the trailing always-masked cols may differ (zeros
    vs the pad/reshape trick's wrapped junk)."""
    import numpy as np

    from bdm_db1_tpu.ops.attention import rel_shift, rel_shift_sliced

    rng = np.random.RandomState(0)
    for q, mlen in ((1, 7), (5, 9), (18, 32), (7, 0)):
        k = mlen + q
        x = jnp.asarray(rng.randn(2, 3, q, k), jnp.float32)
        a = np.asarray(rel_shift(x))
        b = np.asarray(rel_shift_sliced(x))
        for i in range(q):
            valid = mlen + i + 1
            np.testing.assert_allclose(a[:, :, i, :valid], b[:, :, i, :valid],
                                       rtol=0, atol=0,
                                       err_msg=f"q={q} mlen={mlen} row {i}")
