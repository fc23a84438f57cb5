"""Pallas flash rel-attention vs the XLA reference path (interpret mode on
CPU; the same kernel compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bdm_db1_tpu.ops.attention import (
    causal_mask, rel_attention, same_length_mask,
)
from bdm_db1_tpu.ops.pallas_attention import (
    pallas_applicable, pallas_rel_attention,
)


def _inputs(b, qlen, klen, h, dh, seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.3)
    return (mk(b, qlen, h, dh), mk(b, klen, h, dh), mk(b, klen, h, dh),
            mk(klen, h, dh), mk(h, dh), mk(h, dh))


@pytest.mark.parametrize("same_length", [False, True])
@pytest.mark.parametrize("qlen,klen,mem_len", [
    (256, 256, 256), (128, 384, 256), (512, 512, 512),
])
def test_pallas_matches_reference(same_length, qlen, klen, mem_len):
    b, h, dh = 2, 2, 128
    block_q = block_k = 128
    assert pallas_applicable(qlen, klen, block_q, block_k)
    q, k, v, rk, rw, rr = _inputs(b, qlen, klen, h, dh)
    scale = 1.0 / dh ** 0.5

    out_p = pallas_rel_attention(
        q, k, v, rk, rw, rr, mem_len, same_length, scale,
        block_q, block_k, True)

    mask = (same_length_mask(qlen, klen, mem_len) if same_length
            else causal_mask(qlen, klen))
    out_ref = rel_attention(q, k, v, rk, rw, rr, mask, scale=scale,
                            compute_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("same_length,qlen,klen,mem_len", [
    (False, 128, 256, 256),
    (False, 256, 384, 384),   # multiple i- and j-blocks
    (True, 256, 512, 256),    # sliding-window mask
])
def test_pallas_gradients_match_reference(same_length, qlen, klen, mem_len):
    b, h, dh = 1, 2, 128
    q, k, v, rk, rw, rr = _inputs(b, qlen, klen, h, dh, seed=1)
    scale = 1.0 / dh ** 0.5
    mask = (same_length_mask(qlen, klen, mem_len) if same_length
            else causal_mask(qlen, klen))
    g = jnp.asarray(
        np.random.RandomState(3).randn(b, qlen, h, dh).astype(np.float32))

    def loss_p(q, k, v, rk, rw, rr):
        return (pallas_rel_attention(
            q, k, v, rk, rw, rr, mem_len, same_length, scale,
            128, 128, True) * g).sum()

    def loss_r(q, k, v, rk, rw, rr):
        return (rel_attention(q, k, v, rk, rw, rr, mask, scale=scale,
                              compute_dtype=jnp.float32) * g).sum()

    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3, 4, 5))(q, k, v, rk, rw, rr)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4, 5))(q, k, v, rk, rw, rr)
    for name, a, b_ in zip("q k v rk rw rr".split(), gp, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-4,
            err_msg=f"grad mismatch for {name}")


def test_applicability_guard():
    assert not pallas_applicable(3, 64)
    assert not pallas_applicable(128, 100)
    assert pallas_applicable(1024, 2048)


@pytest.mark.parametrize("qlen,mlen", [(100, 256), (300, 512), (257, 256)])
def test_anylen_wrapper_matches_reference(qlen, mlen):
    from bdm_db1_tpu.ops.pallas_attention import (
        pallas_anylen_applicable, pallas_rel_attention_anylen,
    )

    b, h, dh = 1, 2, 128
    klen = mlen + qlen
    assert pallas_anylen_applicable(qlen, klen, 128)
    q, k, v, rk, rw, rr = _inputs(b, qlen, klen, h, dh, seed=4)
    scale = 1.0 / dh ** 0.5
    out_p = pallas_rel_attention_anylen(
        q, k, v, rk, rw, rr, mlen, True, scale, 128, True)
    mask = same_length_mask(qlen, klen, mlen)
    out_r = rel_attention(q, k, v, rk, rw, rr, mask, scale=scale,
                          compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r),
                               rtol=3e-4, atol=3e-4)

    # gradients flow through the pad/slice wrapper
    g = jnp.ones((b, qlen, h, dh))
    gp = jax.grad(lambda q: (pallas_rel_attention_anylen(
        q, k, v, rk, rw, rr, mlen, True, scale, 128, True) * g).sum())(q)
    gr = jax.grad(lambda q: (rel_attention(
        q, k, v, rk, rw, rr, mask, scale=scale,
        compute_dtype=jnp.float32) * g).sum())(q)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                               rtol=5e-4, atol=5e-4)
