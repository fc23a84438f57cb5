"""int8-weight matmul kernel (ops/quant_matmul.py, interpret mode):
quantize-dequantize round trip and kernel-vs-XLA parity."""

import jax
import jax.numpy as jnp
import numpy as np

from bdm_db1_tpu.ops.quant_matmul import quant_matmul, quantize_weight


def test_quantize_weight_roundtrip():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(64, 48).astype(np.float32)) * 0.02
    wq, s = quantize_weight(w)
    assert wq.dtype == jnp.int8 and s.shape == (48,)
    deq = np.asarray(wq, np.float32) * np.asarray(s)[None, :]
    # symmetric per-channel absmax/127: error bounded by scale/2 per elem
    err = np.abs(deq - np.asarray(w))
    assert (err <= np.asarray(s)[None, :] * 0.5 + 1e-8).all()
    # zero column gets scale 1.0, stays exactly zero
    w0 = w.at[:, 0].set(0.0)
    wq0, s0 = quantize_weight(w0)
    assert float(s0[0]) == 1.0 and not np.asarray(wq0[:, 0]).any()


def test_quant_matmul_matches_xla():
    """kernel == x @ (w_q * scale) computed in XLA f32, over multiple
    k/n blocks (accumulation + revisited output block)."""
    rng = np.random.RandomState(1)
    B, K, N = 8, 64, 96
    x = jnp.asarray(rng.randn(B, K).astype(np.float32))
    w = jnp.asarray(rng.randn(K, N).astype(np.float32)) * 0.05
    wq, s = quantize_weight(w)

    y = quant_matmul(x, wq, s, block_k=16, block_n=32, interpret=True)
    ref = (x @ (wq.astype(jnp.float32) * s[None, :]))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # and the quantized product approximates the unquantized one
    full = np.asarray(x @ w)
    rel = np.abs(np.asarray(y) - full) / (np.abs(full).max() + 1e-6)
    assert rel.max() < 0.02


def test_quant_matmul_bf16_activations():
    rng = np.random.RandomState(2)
    B, K, N = 4, 32, 32
    x = jnp.asarray(rng.randn(B, K), jnp.bfloat16)
    w = jnp.asarray(rng.randn(K, N).astype(np.float32)) * 0.1
    wq, s = quantize_weight(w)
    y = quant_matmul(x, wq, s, block_k=16, block_n=16, interpret=True)
    assert y.dtype == jnp.float32
    ref = x.astype(jnp.float32) @ (wq.astype(jnp.float32) * s[None, :])
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_decode_with_int8_weights():
    """End-to-end ring decode with quantize_decode_weights: same action
    geometry, bounded logit drift vs the exact-weight decode, and the
    QDense/train param trees stay loadable (quantization is a runtime
    transform, not a checkpoint format)."""
    import dataclasses

    from bdm_db1_tpu.core.config import db1_tiny
    from bdm_db1_tpu.data.input_specs import RLTaskBatch
    from bdm_db1_tpu.models.transformer_xl import (
        TransformerXL, decode_weights_quantized, quantize_decode_weights,
    )

    cfg = db1_tiny()
    cfg.model.dtype = "float32"
    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    layout = cfg.vocab.layout()
    tok0 = jnp.zeros((1, cfg.model.n_position), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), {"rl": RLTaskBatch(
        tokens=tok0, position_id=tok0, loss_mask=tok0, label=tok0)})["params"]
    qparams = quantize_decode_weights(params)
    assert decode_weights_quantized(qparams)
    assert not decode_weights_quantized(params)

    ring = model.apply({"params": params}, 2,
                       method=TransformerXL.init_kv_cache_ring)
    ring_q = model.apply({"params": qparams}, 2,
                         method=TransformerXL.init_kv_cache_ring)
    rng = np.random.RandomState(5)
    rk = model.apply({"params": params}, 6,
                     method=TransformerXL.precompute_rk)
    rk_q = model.apply({"params": qparams}, 6,
                       method=TransformerXL.precompute_rk)
    # r_net is NOT quantized: rk must be identical
    np.testing.assert_array_equal(np.asarray(rk), np.asarray(rk_q))

    drifts = []
    for step in range(3):
        t = jnp.asarray(
            rng.randint(0, layout.total_vocab_size, (2, 6)), jnp.int32)
        p = jnp.asarray(rng.randint(0, 8, (2, 6)), jnp.int32)
        lg, ring = model.apply({"params": params}, t, p, ring, rk,
                               method=TransformerXL.decode_rl_kv_ring)
        lg_q, ring_q = model.apply({"params": qparams}, t, p, ring_q, rk,
                                   method=TransformerXL.decode_rl_kv_ring)
        lg, lg_q = np.asarray(lg), np.asarray(lg_q)
        assert lg_q.shape == lg.shape and np.isfinite(lg_q).all()
        spread = lg.max() - lg.min() + 1e-6
        drifts.append(np.abs(lg_q - lg).max() / spread)
    # per-channel int8 weight noise stays a small fraction of logit range
    assert max(drifts) < 0.01, drifts


def test_w8a8_matmul_parity():
    """w8a8_matmul == round(x/xs) @ w_q * xs * scale computed explicitly
    in f32 (the int32 accumulation is exact: |acc| <= K*127^2 << 2^31),
    and approximates the unquantized product."""
    from bdm_db1_tpu.ops.quant_matmul import w8a8_matmul

    rng = np.random.RandomState(11)
    B, K, N = 12, 64, 96
    x = jnp.asarray(rng.randn(B, K).astype(np.float32))
    w = jnp.asarray(rng.randn(K, N).astype(np.float32)) * 0.05
    wq, s = quantize_weight(w)

    y = np.asarray(w8a8_matmul(x, wq, s))
    amax = np.abs(np.asarray(x)).max(axis=1, keepdims=True)
    xs = np.where(amax > 0, amax / 127.0, 1.0)
    xq = np.clip(np.round(np.asarray(x) / xs), -127, 127)
    ref = (xq @ np.asarray(wq, np.float32)) * xs * np.asarray(s)[None, :]
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)
    full = np.asarray(x @ w)
    rel = np.abs(y - full) / (np.abs(full).max() + 1e-6)
    assert rel.max() < 0.05
    # all-zero rows stay exactly zero (xs falls back to 1.0)
    y0 = np.asarray(w8a8_matmul(jnp.zeros((2, K)), wq, s))
    assert not y0.any()


def test_decode_with_w8a8_weights():
    """decode_weight_dtype="int8a8": same quantized param tree as "int8"
    but consumed via the MXU-native int8 x int8 dot with per-row
    activation scales — bounded logit drift vs the exact-weight decode."""
    from bdm_db1_tpu.core.config import db1_tiny
    from bdm_db1_tpu.data.input_specs import RLTaskBatch
    from bdm_db1_tpu.models.transformer_xl import (
        TransformerXL, quantize_decode_weights,
    )

    cfg = db1_tiny()
    cfg.model.dtype = "float32"
    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    cfg_a8 = db1_tiny()
    cfg_a8.model.dtype = "float32"
    cfg_a8.model.decode_weight_dtype = "int8a8"
    model_a8 = TransformerXL(cfg_a8.model, cfg_a8.vocab, cfg_a8.vision)

    layout = cfg.vocab.layout()
    tok0 = jnp.zeros((1, cfg.model.n_position), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), {"rl": RLTaskBatch(
        tokens=tok0, position_id=tok0, loss_mask=tok0, label=tok0)})["params"]
    qparams = quantize_decode_weights(params)

    ring = model.apply({"params": params}, 2,
                       method=TransformerXL.init_kv_cache_ring)
    ring_q = model.apply({"params": params}, 2,
                         method=TransformerXL.init_kv_cache_ring)
    rk = model.apply({"params": params}, 6,
                     method=TransformerXL.precompute_rk)
    rng = np.random.RandomState(13)
    drifts = []
    for _ in range(3):
        t = jnp.asarray(
            rng.randint(0, layout.total_vocab_size, (2, 6)), jnp.int32)
        p = jnp.asarray(rng.randint(0, 8, (2, 6)), jnp.int32)
        lg, ring = model.apply({"params": params}, t, p, ring, rk,
                               method=TransformerXL.decode_rl_kv_ring)
        lg_q, ring_q = model_a8.apply({"params": qparams}, t, p, ring_q, rk,
                                      method=TransformerXL.decode_rl_kv_ring)
        lg, lg_q = np.asarray(lg), np.asarray(lg_q)
        assert lg_q.shape == lg.shape and np.isfinite(lg_q).all()
        spread = lg.max() - lg.min() + 1e-6
        drifts.append(np.abs(lg_q - lg).max() / spread)
    # weight + activation int8 noise: wider than weight-only but bounded
    assert max(drifts) < 0.03, drifts


def test_select_blocks_minimizes_weight_restreams():
    """Every m-tile re-streams the full [K, N] weight from HBM, so the row
    tile must minimize the m-tile count, not the padded rows (r3 advisor):
    B=1040 must not pick bm=128 (9 weight streams) when 512/1024 give 2-3."""
    from bdm_db1_tpu.ops.quant_matmul import select_blocks

    for B in (1040, 2049, 1500):
        bm, _, _ = select_blocks(B, 2048, 8192, 1024, 512, 1024,
                                 jnp.bfloat16)
        streams = -(-B // bm)
        assert streams <= -(-B // 128) // 2, (B, bm, streams)
        assert bm % 16 == 0


def test_select_blocks_sublane_alignment():
    """The VMEM shrink must never produce a sublane-misaligned bm (Mosaic
    can reject second-minor-unaligned blocks on the real chip — a latent
    compile failure interpret mode can't catch, r3 advisor): bf16 B=1008
    halving to 504 and f32 B=1000 halving to 500 were the bugs."""
    from bdm_db1_tpu.ops.quant_matmul import select_blocks

    bm, _, _ = select_blocks(1008, 2048, 8192, 1024, 512, 1024,
                             jnp.bfloat16)
    assert bm % 16 == 0, bm
    bm, _, _ = select_blocks(1000, 2048, 8192, 1024, 512, 1024,
                             jnp.float32)
    assert bm % 8 == 0, bm
    # a caller-supplied block_m off the tile menu (e.g. 20) rounds down to
    # a sublane multiple instead of passing through verbatim
    bm, _, _ = select_blocks(100, 64, 96, 20, 32, 32, jnp.float32)
    assert bm % 8 == 0 and bm <= 20, bm


def test_quant_matmul_odd_block_m():
    """Functional check of the off-menu block_m path (B > block_m)."""
    rng = np.random.RandomState(7)
    K, N = 64, 96
    w = jnp.asarray(rng.randn(K, N).astype(np.float32)) * 0.05
    wq, s = quantize_weight(w)
    ref_w = wq.astype(jnp.float32) * s[None, :]
    x = jnp.asarray(rng.randn(100, K).astype(np.float32))
    y = quant_matmul(x, wq, s, block_m=20, block_k=32, block_n=32,
                     interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x @ ref_w),
                               rtol=1e-5, atol=1e-5)


def test_quant_matmul_tiles_rows():
    """Prime-shaped row counts (B = batch x q_chunk, e.g. 10,240 at 1.2B
    b40 q256) must tile over a bm grid dimension — full-height output/acc
    blocks were a real-chip Mosaic kernel-vmem-stack OOM. Covers: B a
    multiple of the tile, B needing pad rows, and tiny B (pad-to-sublane),
    all against the XLA product."""
    rng = np.random.RandomState(3)
    K, N = 64, 96
    w = jnp.asarray(rng.randn(K, N).astype(np.float32)) * 0.05
    wq, s = quantize_weight(w)
    ref_w = wq.astype(jnp.float32) * s[None, :]
    for B, bm in ((96, 32), (72, 32), (20, 64)):
        x = jnp.asarray(rng.randn(B, K).astype(np.float32))
        y = quant_matmul(x, wq, s, block_m=bm, block_k=32, block_n=32,
                         interpret=True)
        assert y.shape == (B, N)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x @ ref_w),
                                   rtol=1e-5, atol=1e-5)
