"""Parity of the fused Pallas single-token ring-decode path
(ops/flash_ring_decode.py, interpret mode on CPU) with the XLA einsum ring
branch it replaces — same cache, same params, logits must agree through
many steps including cursor wraparound, for both mask modes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bdm_db1_tpu.core.config import db1_tiny
from bdm_db1_tpu.data.input_specs import RLTaskBatch
from bdm_db1_tpu.models.transformer_xl import TransformerXL
from bdm_db1_tpu.ops.flash_ring_decode import (
    combine_self_column, flash_ring_decode,
)


def test_kernel_matches_dense_softmax():
    """Kernel + self-column epilogue == dense masked softmax attention."""
    L, B, M, H, Dh = 3, 2, 16, 4, 8
    rng = np.random.RandomState(0)
    k2 = jnp.asarray(rng.randn(L, B, M, H, Dh), jnp.float32)
    v2 = jnp.asarray(rng.randn(L, B, M, H, Dh), jnp.float32)
    qw = jnp.asarray(rng.randn(B, H, Dh), jnp.float32)
    bias = jnp.asarray(rng.randn(B, H, M), jnp.float32)
    bias = bias.at[:, :, 5].set(-1e30)          # one banned ring slot
    scale = 1.0 / np.sqrt(Dh)
    lidx = jnp.array(1, jnp.int32)

    o, m, l = flash_ring_decode(
        k2, v2, qw, bias, lidx, n_head=H, d_head=Dh, scale=scale,
        block_m=8, interpret=True)

    kf = np.asarray(k2[1], np.float32)
    vf = np.asarray(v2[1], np.float32)
    qwf = np.asarray(qw, np.float32)
    s_ref = np.einsum("bhd,bmhd->bhm", qwf, kf) * scale + np.asarray(bias)
    k_x = rng.randn(B, H, Dh).astype(np.float32)
    v_x = rng.randn(B, H, Dh).astype(np.float32)
    s_x = (qwf * k_x).sum(-1) * scale
    s_full = np.concatenate([s_ref, s_x[..., None]], -1)
    p = np.exp(s_full - s_full.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    out_ref = np.einsum("bhm,bmhd->bhd", p[..., :M], vf) + p[..., M:] * v_x
    assert p[..., 5].max() == 0.0               # mask respected

    out = combine_self_column(o, m, l, jnp.asarray(s_x), jnp.asarray(v_x),
                              H, Dh)
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("same_length", [True, False])
def test_flash_ring_matches_xla_ring(same_length):
    cfg = db1_tiny()
    cfg.model.dtype = "float32"
    cfg.model.same_length = same_length
    model_xla = TransformerXL(cfg.model, cfg.vocab, cfg.vision)

    import dataclasses
    cfg_fl = dataclasses.replace(cfg.model, decode_flash="on")
    model_fl = TransformerXL(cfg_fl, cfg.vocab, cfg.vision)
    assert model_fl.cfg.decode_flash == "on"

    layout = cfg.vocab.layout()
    tok0 = jnp.zeros((2, cfg.model.n_position), jnp.int32)
    params = model_xla.init(jax.random.PRNGKey(0), {"rl": RLTaskBatch(
        tokens=tok0, position_id=tok0, loss_mask=tok0, label=tok0)})["params"]

    rk1 = model_xla.apply({"params": params}, 1,
                          method=TransformerXL.precompute_rk)
    ring_a = model_xla.apply({"params": params}, 2,
                             method=TransformerXL.init_kv_cache_ring)
    ring_b = jax.tree.map(lambda x: x, ring_a)

    rng = np.random.RandomState(1)
    # prime through the (shared, XLA) multi-token ring path first so the
    # single-token steps run against a non-trivial cache + cursor
    prime = jnp.asarray(
        rng.randint(0, layout.total_vocab_size, (2, 7)), jnp.int32)
    ppos = jnp.asarray(rng.randint(0, 8, (2, 7)), jnp.int32)
    rk7 = model_xla.apply({"params": params}, 7,
                          method=TransformerXL.precompute_rk)
    _, ring_a = model_xla.apply({"params": params}, prime, ppos, ring_a, rk7,
                                method=TransformerXL.decode_rl_kv_ring)
    _, ring_b = model_fl.apply({"params": params}, prime, ppos, ring_b, rk7,
                               method=TransformerXL.decode_rl_kv_ring)

    # 40 single-token steps > mem_len (32): covers cursor wraparound
    for step in range(40):
        t = jnp.asarray(
            rng.randint(0, layout.total_vocab_size, (2, 1)), jnp.int32)
        p = jnp.zeros((2, 1), jnp.int32)
        lg_a, ring_a = model_xla.apply(
            {"params": params}, t, p, ring_a, rk1,
            method=TransformerXL.decode_rl_kv_ring)
        lg_b, ring_b = model_fl.apply(
            {"params": params}, t, p, ring_b, rk1,
            method=TransformerXL.decode_rl_kv_ring)
        np.testing.assert_allclose(
            np.asarray(lg_b), np.asarray(lg_a), rtol=5e-5, atol=5e-5,
            err_msg=f"step {step}")
        np.testing.assert_allclose(
            np.asarray(ring_b["k"]), np.asarray(ring_a["k"]),
            rtol=5e-6, atol=5e-6)
        assert int(ring_b["cursor"]) == int(ring_a["cursor"])


def test_flash_ring_int8_matches_xla_int8():
    """In-kernel-dequant flash path == the XLA int8 ring branch, fed the
    SAME quantized cache every step (identical caches by construction, so
    tight logit tolerances check the forward math alone; the write path is
    shared code). Covers the q == 1 kernel and the q > 1 prime kernel."""
    import dataclasses

    cfg = db1_tiny()
    cfg.model.dtype = "float32"
    cfg.model.decode_cache_dtype = "int8"
    cfg_off = dataclasses.replace(cfg.model, decode_flash="off")
    cfg_on = dataclasses.replace(cfg.model, decode_flash="on")
    model_xla = TransformerXL(cfg_off, cfg.vocab, cfg.vision)
    model_fl = TransformerXL(cfg_on, cfg.vocab, cfg.vision)

    layout = cfg.vocab.layout()
    tok0 = jnp.zeros((2, cfg.model.n_position), jnp.int32)
    params = model_xla.init(jax.random.PRNGKey(0), {"rl": RLTaskBatch(
        tokens=tok0, position_id=tok0, loss_mask=tok0, label=tok0)})["params"]

    ring = model_xla.apply({"params": params}, 2,
                           method=TransformerXL.init_kv_cache_ring)
    assert ring["k"].dtype == jnp.int8 and "k_scale" in ring

    rng = np.random.RandomState(3)
    rk1 = model_xla.apply({"params": params}, 1,
                          method=TransformerXL.precompute_rk)
    rk7 = model_xla.apply({"params": params}, 7,
                          method=TransformerXL.precompute_rk)
    # interleave q == 7 primes with q == 1 steps; > mem_len total so the
    # cursor wraps; both models read the same (XLA-written) ring each step
    for step in range(12):
        q = 7 if step % 4 == 0 else 1
        t = jnp.asarray(
            rng.randint(0, layout.total_vocab_size, (2, q)), jnp.int32)
        p = jnp.asarray(rng.randint(0, 8, (2, q)), jnp.int32)
        rk = rk7 if q == 7 else rk1
        lg_fl, ring_fl = model_fl.apply(
            {"params": params}, t, p, ring, rk,
            method=TransformerXL.decode_rl_kv_ring)
        lg_xla, ring = model_xla.apply(
            {"params": params}, t, p, ring, rk,
            method=TransformerXL.decode_rl_kv_ring)
        np.testing.assert_allclose(
            np.asarray(lg_fl), np.asarray(lg_xla), rtol=5e-5, atol=5e-5,
            err_msg=f"step {step} q {q}")
        assert int(ring_fl["cursor"]) == int(ring["cursor"])


def test_prime_allpairs_matches_perhead():
    """flash_ring_prime_ap (all-pairs, one wide MXU dot) == flash_ring_prime
    (per-head tiles) on the same exact-dtype cache — including banned ring
    slots and a fully-banned (head, query) column, whose junk both kernels
    must confine to a -1e30 block max that the epilogue zeroes."""
    from bdm_db1_tpu.ops.flash_ring_decode import (
        flash_ring_prime, flash_ring_prime_ap,
    )

    L, B, M, H, Dh, Q = 3, 2, 16, 4, 8, 5
    rng = np.random.RandomState(1)
    k2 = jnp.asarray(rng.randn(L, B, M, H, Dh), jnp.float32)
    v2 = jnp.asarray(rng.randn(L, B, M, H, Dh), jnp.float32)
    qw = jnp.asarray(rng.randn(B, H, Q, Dh), jnp.float32)
    bias = jnp.asarray(rng.randn(B, H, Q, M), jnp.float32)
    bias = bias.at[:, :, :, 3].set(-1e30)        # one banned ring slot
    bias = bias.at[:, 2, 1, :].set(-1e30)        # fully-banned column
    scale = 1.0 / np.sqrt(Dh)
    lidx = jnp.array(2, jnp.int32)

    o_a, m_a, l_a = flash_ring_prime_ap(
        k2, v2, qw, bias, lidx, n_head=H, d_head=Dh, scale=scale,
        block_m=8, interpret=True)
    o_p, m_p, l_p = flash_ring_prime(
        k2, v2, qw, bias, lidx, n_head=H, d_head=Dh, scale=scale,
        block_m=8, interpret=True)

    # normalized outputs agree everywhere the column is live
    live = np.asarray(m_p) > -1e29
    out_a = np.asarray(o_a) / np.asarray(l_a)[..., None]
    out_p = np.asarray(o_p) / np.asarray(l_p)[..., None]
    np.testing.assert_allclose(out_a[live], out_p[live],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(m_a)[live], np.asarray(m_p)[live],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(l_a)[live], np.asarray(l_p)[live],
                               rtol=2e-5, atol=2e-5)
    # the dead column's max stays at the sentinel so the epilogue zeroes it
    assert (np.asarray(m_a)[~live] < -1e29).all()


def test_prime_allpairs_int8_matches_perhead_int8():
    """Quantized all-pairs prime (scales in stored [L,B,M,H] layout,
    in-kernel pltpu.repeat replication) == the per-head prime kernel fed
    the same scales pre-transposed to its [L,B,H,M] layout."""
    from bdm_db1_tpu.ops.flash_ring_decode import (
        flash_ring_prime, flash_ring_prime_ap,
    )

    L, B, M, H, Dh, Q = 2, 2, 16, 4, 8, 3
    rng = np.random.RandomState(4)
    k2 = jnp.asarray(rng.randint(-127, 128, (L, B, M, H, Dh)), jnp.int8)
    v2 = jnp.asarray(rng.randint(-127, 128, (L, B, M, H, Dh)), jnp.int8)
    ks = jnp.asarray(rng.rand(L, B, M, H) * 0.1 + 0.01, jnp.float32)
    vs = jnp.asarray(rng.rand(L, B, M, H) * 0.1 + 0.01, jnp.float32)
    qw = jnp.asarray(rng.randn(B, H, Q, Dh), jnp.float32)
    bias = jnp.asarray(rng.randn(B, H, Q, M), jnp.float32)
    bias = bias.at[:, :, :, 7].set(-1e30)        # one banned ring slot
    scale = 1.0 / np.sqrt(Dh)
    lidx = jnp.array(1, jnp.int32)

    o_a, m_a, l_a = flash_ring_prime_ap(
        k2, v2, qw, bias, lidx, ks, vs, n_head=H, d_head=Dh, scale=scale,
        block_m=8, interpret=True)
    o_p, m_p, l_p = flash_ring_prime(
        k2, v2, qw, bias, lidx, ks.transpose(0, 1, 3, 2),
        vs.transpose(0, 1, 3, 2), n_head=H, d_head=Dh, scale=scale,
        block_m=8, interpret=True)

    np.testing.assert_allclose(np.asarray(m_a), np.asarray(m_p),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(l_a), np.asarray(l_p),
                               rtol=2e-5, atol=2e-5)
    out_a = np.asarray(o_a) / np.asarray(l_a)[..., None]
    out_p = np.asarray(o_p) / np.asarray(l_p)[..., None]
    np.testing.assert_allclose(out_a, out_p, rtol=2e-5, atol=2e-5)


def test_prime_allpairs_compact_matches_default():
    """compact=True (diagonal-extracted softmax: 16x less exp/reduce VPU
    work, xprof r5) is output-equal with the default all-pairs path —
    bf16-exact caches AND int8+scales, including banned slots and a
    fully-banned column."""
    from bdm_db1_tpu.ops.flash_ring_decode import flash_ring_prime_ap

    L, B, M, H, Dh, Q = 3, 2, 16, 4, 8, 5
    rng = np.random.RandomState(7)
    k2 = jnp.asarray(rng.randn(L, B, M, H, Dh), jnp.float32)
    v2 = jnp.asarray(rng.randn(L, B, M, H, Dh), jnp.float32)
    qw = jnp.asarray(rng.randn(B, H, Q, Dh), jnp.float32)
    bias = jnp.asarray(rng.randn(B, H, Q, M), jnp.float32)
    bias = bias.at[:, :, :, 3].set(-1e30)
    bias = bias.at[:, 2, 1, :].set(-1e30)
    scale = 1.0 / np.sqrt(Dh)
    lidx = jnp.array(2, jnp.int32)
    kw = dict(n_head=H, d_head=Dh, scale=scale, block_m=8, interpret=True)

    o_d, m_d, l_d = flash_ring_prime_ap(k2, v2, qw, bias, lidx, **kw)
    o_c, m_c, l_c = flash_ring_prime_ap(k2, v2, qw, bias, lidx,
                                        compact=True, **kw)
    live = np.asarray(m_d) > -1e29
    np.testing.assert_allclose(np.asarray(m_c)[live], np.asarray(m_d)[live],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(l_c)[live], np.asarray(l_d)[live],
                               rtol=2e-5, atol=2e-5)
    out_d = np.asarray(o_d) / np.asarray(l_d)[..., None]
    out_c = np.asarray(o_c) / np.asarray(l_c)[..., None]
    np.testing.assert_allclose(out_c[live], out_d[live],
                               rtol=2e-5, atol=2e-5)
    assert (np.asarray(m_c)[~live] < -1e29).all()

    # int8 + scales
    k8 = jnp.asarray(rng.randint(-127, 128, (L, B, M, H, Dh)), jnp.int8)
    v8 = jnp.asarray(rng.randint(-127, 128, (L, B, M, H, Dh)), jnp.int8)
    ks = jnp.asarray(rng.rand(L, B, M, H) * 0.1 + 0.01, jnp.float32)
    vs = jnp.asarray(rng.rand(L, B, M, H) * 0.1 + 0.01, jnp.float32)
    o_d, m_d, l_d = flash_ring_prime_ap(k8, v8, qw, bias, lidx, ks, vs,
                                        **kw)
    o_c, m_c, l_c = flash_ring_prime_ap(k8, v8, qw, bias, lidx, ks, vs,
                                        compact=True, **kw)
    np.testing.assert_allclose(np.asarray(m_c), np.asarray(m_d),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(l_c), np.asarray(l_d),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(o_c) / np.asarray(l_c)[..., None],
        np.asarray(o_d) / np.asarray(l_d)[..., None],
        rtol=2e-5, atol=2e-5)


def test_compact_prime_decode_chain_matches():
    """decode_prime_compact=True end to end: greedy chains equal the
    default flash chain and the XLA ring chain."""
    import dataclasses

    from test_batched_eval import _setup
    from test_speculative import _chain, _episode_primes

    from bdm_db1_tpu.eval.decode import build_decoder_for_env
    from bdm_db1_tpu.eval.envs import FakeContinuousEnv
    from bdm_db1_tpu.models.transformer_xl import TransformerXL

    cfg, model, params, tenvs = _setup(
        FakeContinuousEnv, 2, obs_dim=4, act_dim=2, episode_len=8)
    primes = _episode_primes(tenvs, 0, 5, 4)
    xmodel = TransformerXL(
        dataclasses.replace(model.cfg, decode_flash="off"),
        cfg.vocab, cfg.vision)
    ref = _chain(build_decoder_for_env(xmodel, params, tenvs[0]),
                 primes, defer=True)
    cmodel = TransformerXL(
        dataclasses.replace(model.cfg, decode_flash="on",
                            decode_prime_compact=True),
        cfg.vocab, cfg.vision)
    got = _chain(build_decoder_for_env(cmodel, params, tenvs[0]),
                 primes, defer=True)
    for k, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_array_equal(a, b, err_msg=f"step {k}")
