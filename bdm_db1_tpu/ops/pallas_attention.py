"""Fused relative-position flash attention (Pallas, TPU).

The XLA path (bdm_db1_tpu/ops/attention.py) materializes the fp32
[B, H, q, k] score tensor — pure HBM traffic at seq 1024. This kernel
computes TransformerXL attention blockwise in VMEM with online softmax,
never materializing scores:

    AC[i,j] = (q_i + r_w) . k_j
    BD[i,j] = (q_i + r_r) . rk_t,   t = j - i + (qlen - 1)

(positional rows are stored for descending distances,
reference: src/model/transformer_xl.py:34-50, so the valid band is
contiguous). Per (i-block, j-block) the BD term touches a contiguous band of
``block_q + block_k`` rk rows; the in-block diagonal alignment uses the
flattened-stride form of the zero-pad rel-shift trick
(reference: transformer_xl.py:98-110): for x [q, W], out[i, j] = x[i, j+q-1-i]
equals flat(x)[q-1 + i*(W-1) + j].

Masking (plain causal or TXL ``same_length`` sliding window,
reference: transformer_xl.py:551-567) happens via in-kernel index
arithmetic — no mask tensor in HBM.

Forward is Pallas; the custom VJP recomputes gradients through the XLA
reference path (identical math), so training gradients are exact while the
hot forward runs fused.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bdm_db1_tpu.ops import attention as xla_attn

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256
NEG_INF = -1e30


def _rel_attention_kernel(
    q_ref,      # [bq, d]
    k_ref,      # [klen, d]
    v_ref,      # [klen, d]
    rk_ref,     # [klen, d]   projected positional embeddings
    rw_ref,     # [1, d]      r_w_bias row for this head
    rr_ref,     # [1, d]      r_r_bias row for this head
    o_ref,      # [bq, d]
    *,
    block_k: int,
    qlen: int,
    klen: int,
    mem_len: int,
    same_length: bool,
    scale: float,
):
    bq, d = q_ref.shape
    iq = pl.program_id(1)  # query-block index (grid dim 0 is batch*head)
    q = q_ref[:].astype(jnp.float32)
    qw = q + rw_ref[0, :].astype(jnp.float32)
    qr = q + rr_ref[0, :].astype(jnp.float32)

    mlen = klen - qlen
    band_rows = bq + block_k
    row_ids = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 0)
    num_kb = klen // block_k

    def body(jb, carry):
        m_prev, l_prev, acc = carry
        k_blk = k_ref[pl.ds(jb * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[pl.ds(jb * block_k, block_k), :]

        ac = jax.lax.dot_general(
            qw, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [bq, bk]

        # ---- BD band ----------------------------------------------------
        # t(i_local, j_local) = band_start + (bq-1 - i_local) + j_local,
        # band_start = jb*bk - iq*bq + (qlen - bq) >= 0 always; rk is padded
        # to klen+qlen rows in the wrapper so the band never clamps and the
        # rel-shift slice below stays static (rows past klen-1 only pair
        # with masked positions).
        band_start = jb * block_k - iq * bq + (qlen - bq)
        # structurally a multiple of gcd(bq, bk) (qlen % bq == 0); Mosaic
        # needs the alignment hint to vectorize the dynamic sublane load
        band_start = pl.multiple_of(band_start, math.gcd(bq, block_k))
        rk_band = rk_ref[pl.ds(band_start, band_rows), :].astype(jnp.float32)
        qr_band = jax.lax.dot_general(
            qr, rk_band, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [bq, band_rows]
        # out[i, j] = qr_band[i, (bq-1-i) + j]: a per-row left-rotate by
        # (bq-1-i) — Mosaic's strided roll (tpu.dynamic_rotate) in one op.
        # Needed entries never wrap (j + bq-1-i <= band_rows-1 for j < bk).
        rolled = pltpu.roll(
            qr_band, band_rows - (bq - 1), axis=1, stride=1, stride_axis=0)
        bd = rolled[:, :block_k]

        scores = (ac + bd) * scale

        col_ids = jb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (bq, block_k), 1)
        banned = col_ids > (row_ids + mlen)
        if same_length:
            mask_len = klen - mem_len
            shift = qlen - mask_len if mask_len > 0 else qlen
            banned = banned | (col_ids < (row_ids - (shift - 1)))
        scores = jnp.where(banned, NEG_INF, scores)

        m_cur = jnp.max(scores, axis=1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(scores - m_new[:, None])
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((bq,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq,), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)[:, None]).astype(o_ref.dtype)


def pallas_applicable(qlen: int, klen: int,
                      block_q: int = DEFAULT_BLOCK_Q,
                      block_k: int = DEFAULT_BLOCK_K) -> bool:
    bq, bk = min(block_q, qlen), min(block_k, klen)
    return (qlen % bq == 0 and klen % bk == 0 and klen >= bq + bk
            and qlen >= 8 and klen >= 128)


def _pallas_rel_attention_fwd_impl(
    q, k, v, rk, r_w_bias, r_r_bias, *,
    mem_len: int, same_length: bool, scale: float,
    block_q: int = DEFAULT_BLOCK_Q, block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
):
    """q: [B, qlen, H, Dh]; k/v: [B, klen, H, Dh]; rk: [klen, H, Dh];
    biases [H, Dh]. Returns [B, qlen, H, Dh]."""
    b, qlen, h, dh = q.shape
    klen = k.shape[1]
    block_q = min(block_q, qlen)
    block_k = min(block_k, klen)
    assert pallas_applicable(qlen, klen, block_q, block_k)

    qh = q.transpose(0, 2, 1, 3).reshape(b * h, qlen, dh)
    kh = k.transpose(0, 2, 1, 3).reshape(b * h, klen, dh)
    vh = v.transpose(0, 2, 1, 3).reshape(b * h, klen, dh)
    # pad rk so every BD band read is in-bounds (overhang rows pair only
    # with masked positions) — keeps the in-kernel rel-shift slice static
    rk_pad = jnp.pad(rk, ((0, qlen), (0, 0), (0, 0)))
    rklen = klen + qlen
    rkh = jnp.broadcast_to(
        rk_pad.transpose(1, 0, 2)[None],
        (b, h, rklen, dh)).reshape(b * h, rklen, dh)
    rw = jnp.tile(r_w_bias, (b, 1)).reshape(b * h, 1, dh)
    rr = jnp.tile(r_r_bias, (b, 1)).reshape(b * h, 1, dh)

    grid = (b * h, qlen // block_q)
    kernel = functools.partial(
        _rel_attention_kernel, block_k=block_k, qlen=qlen, klen=klen,
        mem_len=mem_len, same_length=same_length, scale=scale)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, dh), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((None, klen, dh), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((None, klen, dh), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((None, rklen, dh), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((None, 1, dh), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((None, 1, dh), lambda bh, i: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, dh), lambda bh, i: (bh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, qlen, dh), q.dtype),
        interpret=interpret,
    )(qh, kh, vh, rkh, rw, rr)
    return out.reshape(b, h, qlen, dh).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def pallas_rel_attention(q, k, v, rk, r_w_bias, r_r_bias,
                         mem_len, same_length, scale,
                         block_q=DEFAULT_BLOCK_Q, block_k=DEFAULT_BLOCK_K,
                         interpret=False):
    return _pallas_rel_attention_fwd_impl(
        q, k, v, rk, r_w_bias, r_r_bias, mem_len=mem_len,
        same_length=same_length, scale=scale, block_q=block_q,
        block_k=block_k, interpret=interpret)


def _ref_attention(q, k, v, rk, r_w_bias, r_r_bias, mem_len, same_length,
                   scale):
    qlen, klen = q.shape[1], k.shape[1]
    if same_length:
        mask = xla_attn.same_length_mask(qlen, klen, mem_len)
    else:
        mask = xla_attn.causal_mask(qlen, klen)
    return xla_attn.rel_attention(
        q, k, v, rk, r_w_bias, r_r_bias, mask, scale=scale,
        compute_dtype=q.dtype)


def _fwd(q, k, v, rk, r_w_bias, r_r_bias, mem_len, same_length, scale,
         block_q, block_k, interpret):
    out = _pallas_rel_attention_fwd_impl(
        q, k, v, rk, r_w_bias, r_r_bias, mem_len=mem_len,
        same_length=same_length, scale=scale, block_q=block_q,
        block_k=block_k, interpret=interpret)
    return out, (q, k, v, rk, r_w_bias, r_r_bias)


def _bwd(mem_len, same_length, scale, block_q, block_k, interpret,
         residuals, g):
    q, k, v, rk, r_w_bias, r_r_bias = residuals
    _, vjp = jax.vjp(
        lambda *args: _ref_attention(*args, mem_len, same_length, scale),
        q, k, v, rk, r_w_bias, r_r_bias)
    return vjp(g)


pallas_rel_attention.defvjp(_fwd, _bwd)
