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

Both directions are Pallas: the forward kernel saves the online-softmax
row stats (m, l); the custom VJP runs fused dq and dk/dv/drk kernels that
recompute score tiles from those stats (flash-attention style), so no
[q, k] tensor is ever materialized in training either. Parity with the XLA
path's gradients is enforced by tests/test_pallas_attention.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bdm_db1_tpu.ops import attention as xla_attn

# 512 measured ~20% faster than 256 end-to-end on v5e at the 1.2B train
# shape (b4 h16 q1024 k1024 dh128): fwd 1.72 vs 2.07 ms, fwd+bwd 5.18 vs
# 6.41 ms — fewer grid steps, larger MXU ops, same VMEM fit (~8 MB)
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 512
NEG_INF = -1e30


def _rel_attention_kernel(
    q_ref,      # [bq, d]
    k_ref,      # [klen, d]
    v_ref,      # [klen, d]
    rk_ref,     # [klen, d]   projected positional embeddings
    rw_ref,     # [1, d]      r_w_bias row for this head
    rr_ref,     # [1, d]      r_r_bias row for this head
    o_ref,      # [bq, d]
    m_ref=None,  # [1, bq] fp32 softmax row max (training: saved for bwd)
    l_ref=None,  # [1, bq] fp32 softmax row normalizer
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
    # band-limited j range: fully-masked key blocks contribute exactly zero
    # (p underflows to 0), so skip them — at q1024/k2048/window-1024 this is
    # 25% of the tiles, more for short decode primes
    j_lo, j_hi = _tile_j_bounds(iq, bq, block_k, num_kb, qlen, klen,
                                mem_len, same_length)

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
    m, l, acc = jax.lax.fori_loop(j_lo, j_hi, body, (m0, l0, acc0))
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)[:, None]).astype(o_ref.dtype)
    if m_ref is not None:
        m_ref[0, :] = m
        l_ref[0, :] = l


def _window_shift(qlen, klen, mem_len):
    mask_len = klen - mem_len
    return qlen - mask_len if mask_len > 0 else qlen


def _tile_j_bounds(iq, bq, block_k, num_kb, qlen, klen, mem_len,
                   same_length):
    """[j_lo, j_hi) range of key blocks with any unmasked entry for query
    block iq (iq may be traced). Causality: col <= row + mlen; same_length
    window: col >= row - (shift - 1)."""
    mlen = klen - qlen
    j_hi = jnp.minimum(num_kb, (iq * bq + bq - 1 + mlen) // block_k + 1)
    if same_length:
        shift = _window_shift(qlen, klen, mem_len)
        j_lo = jnp.maximum(0, (iq * bq - (shift - 1)) // block_k)
    else:
        j_lo = jnp.zeros_like(j_hi)
    return j_lo, j_hi


def _tile_i_bounds(jb, bq, block_k, num_qb, qlen, klen, mem_len,
                   same_length):
    """[i_lo, i_hi) range of query blocks with any unmasked entry for key
    block jb: row >= col - mlen (causality) and, for same_length,
    row <= col + shift - 1."""
    mlen = klen - qlen
    i_lo = jnp.maximum(0, (jb * block_k - mlen) // bq)
    if same_length:
        shift = _window_shift(qlen, klen, mem_len)
        i_hi = jnp.minimum(
            num_qb, (jb * block_k + block_k - 1 + (shift - 1)) // bq + 1)
    else:
        i_hi = jnp.full_like(i_lo, num_qb)
    return i_lo, i_hi


def _tile_scores(q, k_blk, rk_band, rw, rr, *, iq, jb, bq, block_k, qlen,
                 klen, mem_len, same_length, scale):
    """Recompute one (i-block, j-block) score tile + mask + skew pieces.
    Shared by the backward kernels. Returns (scores, banned, qr)."""
    band_rows = bq + block_k
    qf = q.astype(jnp.float32)
    qw = qf + rw
    qr = qf + rr
    ac = jax.lax.dot_general(
        qw, k_blk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    qr_band = jax.lax.dot_general(
        qr, rk_band, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    rolled = pltpu.roll(
        qr_band, band_rows - (bq - 1), axis=1, stride=1, stride_axis=0)
    bd = rolled[:, :block_k]
    scores = (ac + bd) * scale

    row_ids = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 0)
    col_ids = jb * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (bq, block_k), 1)
    mlen = klen - qlen
    banned = col_ids > (row_ids + mlen)
    if same_length:
        mask_len = klen - mem_len
        shift = qlen - mask_len if mask_len > 0 else qlen
        banned = banned | (col_ids < (row_ids - (shift - 1)))
    scores = jnp.where(banned, NEG_INF, scores)
    return scores, qr, qw


def _row_reversal(bq):
    """Anti-identity permutation matrix (Mosaic has no `rev`, and its
    strided roll only lowers small strides — stride band-1, the "-1 mod n"
    emulation of a decreasing rotate, is rejected: max shift in a vreg must
    stay under the vreg width. So reversal matmuls ride the MXU instead)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (bq, bq), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (bq, bq), 1)
    return (r + c == bq - 1).astype(jnp.float32)


def _skew_inner(dsc, bq, block_k):
    """Row-flipped band skew: returns Y with P @ Y == dsk, where
    dsk[i, (bq-1-i)+j] = dsc[i, j] (the inverse of the forward rel-shift
    roll) and P is the [bq, bq] row reversal.

    The full dsk = P @ roll(pad(P @ dsc)) needs a second [bq, bq] x
    [bq, band] reversal matmul; callers instead fold that outer P into
    their adjacent *narrow* product via associativity —
    (P @ Y) @ rk = P @ (Y @ rk) and (P @ Y)^T @ qr = Y^T @ (P @ qr) —
    cutting the reversal cost from 2x[bq, band] to [bq, bk] + [bq, dh]
    (~2.7x fewer skew FLOPs per tile)."""
    band_rows = bq + block_k
    P = _row_reversal(bq)
    flipped = jax.lax.dot_general(
        P, dsc, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # [bq, bk], 2*bq*bq*bk
    padded = jnp.pad(flipped, ((0, 0), (0, band_rows - block_k)))
    # flipped row i' = bq-1-i needs left-rotate by i' (stride +1 lowers)
    return pltpu.roll(padded, 0, axis=1, stride=1, stride_axis=0)


def _rel_attention_bwd_dq_kernel(
    q_ref, k_ref, v_ref, rk_ref, rw_ref, rr_ref, do_ref, m_ref, l_ref,
    delta_ref, dq_ac_ref, dq_bd_ref, *,
    block_k, qlen, klen, mem_len, same_length, scale,
):
    bq, d = q_ref.shape
    iq = pl.program_id(1)
    band_rows = bq + block_k
    q = q_ref[:]
    rw = rw_ref[0, :].astype(jnp.float32)
    rr = rr_ref[0, :].astype(jnp.float32)
    do = do_ref[:].astype(jnp.float32)
    m = m_ref[0, :]
    l = jnp.maximum(l_ref[0, :], 1e-30)
    delta = delta_ref[0, :]
    num_kb = klen // block_k
    j_lo, j_hi = _tile_j_bounds(iq, bq, block_k, num_kb, qlen, klen,
                                mem_len, same_length)

    def body(jb, carry):
        dq_ac, dq_bd = carry
        k_blk = k_ref[pl.ds(jb * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[pl.ds(jb * block_k, block_k), :].astype(jnp.float32)
        band_start = pl.multiple_of(
            jb * block_k - iq * bq + (qlen - bq), math.gcd(bq, block_k))
        rk_band = rk_ref[pl.ds(band_start, band_rows), :].astype(jnp.float32)
        scores, qr, qw = _tile_scores(
            q, k_blk, rk_band, rw, rr, iq=iq, jb=jb, bq=bq,
            block_k=block_k, qlen=qlen, klen=klen, mem_len=mem_len,
            same_length=same_length, scale=scale)
        p = jnp.exp(scores - m[:, None]) / l[:, None]
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dsc = p * (dp - delta[:, None]) * scale
        dq_ac = dq_ac + jax.lax.dot_general(
            dsc, k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dq_bd += (P @ Y) @ rk_band == P @ (Y @ rk_band): do the narrow
        # [bq, d] reversal after the band contraction (see _skew_inner)
        y = _skew_inner(dsc, bq, block_k)
        t = jax.lax.dot_general(
            y, rk_band, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dq_bd = dq_bd + jax.lax.dot_general(
            _row_reversal(bq), t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dq_ac, dq_bd

    zero = jnp.zeros((bq, d), jnp.float32)
    dq_ac, dq_bd = jax.lax.fori_loop(j_lo, j_hi, body, (zero, zero))
    dq_ac_ref[:] = dq_ac.astype(dq_ac_ref.dtype)
    dq_bd_ref[:] = dq_bd.astype(dq_bd_ref.dtype)


def _rel_attention_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, rk_ref, rw_ref, rr_ref, do_ref, m_ref, l_ref,
    delta_ref, dk_ref, dv_ref, drk_part_ref, drk_scratch, *,
    block_q, qlen, klen, mem_len, same_length, scale,
):
    block_k, d = dk_ref.shape
    jb = pl.program_id(1)
    bq = block_q
    band_rows = bq + block_k
    part_rows = qlen + block_k
    rw = rw_ref[0, :].astype(jnp.float32)
    rr = rr_ref[0, :].astype(jnp.float32)
    k_blk = k_ref[:].astype(jnp.float32)   # this j-block only
    v_blk = v_ref[:].astype(jnp.float32)
    num_qb = qlen // bq
    i_lo, i_hi = _tile_i_bounds(jb, bq, block_k, num_qb, qlen, klen,
                                mem_len, same_length)

    drk_scratch[:] = jnp.zeros((part_rows, d), jnp.float32)

    def body(iq, carry):
        dk, dv = carry
        q_blk = q_ref[pl.ds(iq * bq, bq), :]
        do = do_ref[pl.ds(iq * bq, bq), :].astype(jnp.float32)
        m = m_ref[0, pl.ds(iq * bq, bq)]
        l = jnp.maximum(l_ref[0, pl.ds(iq * bq, bq)], 1e-30)
        delta = delta_ref[0, pl.ds(iq * bq, bq)]
        band_start = pl.multiple_of(
            jb * block_k - iq * bq + (qlen - bq), math.gcd(bq, block_k))
        rk_band = rk_ref[pl.ds(band_start, band_rows), :].astype(jnp.float32)
        scores, qr, qw = _tile_scores(
            q_blk, k_blk, rk_band, rw, rr, iq=iq, jb=jb, bq=bq,
            block_k=block_k, qlen=qlen, klen=klen, mem_len=mem_len,
            same_length=same_length, scale=scale)
        p = jnp.exp(scores - m[:, None]) / l[:, None]
        dv = dv + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dsc = p * (dp - delta[:, None]) * scale
        dk = dk + jax.lax.dot_general(
            dsc, qw, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # drk: band rows [offset, offset+band) of this j-block's partial,
        # offset = band_start - jb*bk = (qlen - bq) - iq*bq  (>= 0, mult. bq)
        # contrib = (P @ Y)^T @ qr == Y^T @ (P @ qr): flip the narrow qr
        # instead of the wide band (see _skew_inner)
        y = _skew_inner(dsc, bq, block_k)
        qr_f = jax.lax.dot_general(
            _row_reversal(bq), qr, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        contrib = jax.lax.dot_general(
            y, qr_f, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [band_rows, d]
        offset = pl.multiple_of((qlen - bq) - iq * bq, bq)
        drk_scratch[pl.ds(offset, band_rows), :] = (
            drk_scratch[pl.ds(offset, band_rows), :] + contrib)
        return dk, dv

    zero = jnp.zeros((block_k, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(i_lo, i_hi, body, (zero, zero))
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)
    drk_part_ref[:] = drk_scratch[:].astype(drk_part_ref.dtype)


def pallas_applicable(qlen: int, klen: int,
                      block_q: int = DEFAULT_BLOCK_Q,
                      block_k: int = DEFAULT_BLOCK_K) -> bool:
    bq, bk = min(block_q, qlen), min(block_k, klen)
    return (qlen % bq == 0 and klen % bk == 0 and klen >= bq + bk
            and qlen >= 8 and klen >= 128)


def _prep_inputs(q, k, v, rk, r_w_bias, r_r_bias, qlen, klen, dh, b, h):
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
    return qh, kh, vh, rkh, rw, rr, rklen


def _pallas_rel_attention_fwd_impl(
    q, k, v, rk, r_w_bias, r_r_bias, *,
    mem_len: int, same_length: bool, scale: float,
    block_q: int = DEFAULT_BLOCK_Q, block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False, with_stats: bool = False,
):
    """q: [B, qlen, H, Dh]; k/v: [B, klen, H, Dh]; rk: [klen, H, Dh];
    biases [H, Dh]. Returns [B, qlen, H, Dh] (+ (m, l) [bh, 1, qlen] fp32
    softmax stats when with_stats, for the backward kernels)."""
    b, qlen, h, dh = q.shape
    klen = k.shape[1]
    block_q = min(block_q, qlen)
    block_k = min(block_k, klen)
    assert pallas_applicable(qlen, klen, block_q, block_k)

    qh, kh, vh, rkh, rw, rr, rklen = _prep_inputs(
        q, k, v, rk, r_w_bias, r_r_bias, qlen, klen, dh, b, h)

    grid = (b * h, qlen // block_q)
    kernel = functools.partial(
        _rel_attention_kernel, block_k=block_k, qlen=qlen, klen=klen,
        mem_len=mem_len, same_length=same_length, scale=scale)

    in_specs = [
        pl.BlockSpec((None, block_q, dh), lambda bh, i: (bh, i, 0)),
        pl.BlockSpec((None, klen, dh), lambda bh, i: (bh, 0, 0)),
        pl.BlockSpec((None, klen, dh), lambda bh, i: (bh, 0, 0)),
        pl.BlockSpec((None, rklen, dh), lambda bh, i: (bh, 0, 0)),
        pl.BlockSpec((None, 1, dh), lambda bh, i: (bh, 0, 0)),
        pl.BlockSpec((None, 1, dh), lambda bh, i: (bh, 0, 0)),
    ]
    o_spec = pl.BlockSpec((None, block_q, dh), lambda bh, i: (bh, i, 0))
    o_shape = jax.ShapeDtypeStruct((b * h, qlen, dh), q.dtype)
    if with_stats:
        stat_spec = pl.BlockSpec((None, 1, block_q), lambda bh, i: (bh, 0, i))
        stat_shape = jax.ShapeDtypeStruct((b * h, 1, qlen), jnp.float32)
        out, m, l = pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs,
            out_specs=(o_spec, stat_spec, stat_spec),
            out_shape=(o_shape, stat_shape, stat_shape),
            interpret=interpret,
        )(qh, kh, vh, rkh, rw, rr)
        return out.reshape(b, h, qlen, dh).transpose(0, 2, 1, 3), (m, l)
    out = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs,
        out_specs=o_spec, out_shape=o_shape, interpret=interpret,
    )(qh, kh, vh, rkh, rw, rr)
    return out.reshape(b, h, qlen, dh).transpose(0, 2, 1, 3)


def _pallas_rel_attention_bwd_impl(
    q, k, v, rk, r_w_bias, r_r_bias, out, m, l, g, *,
    mem_len: int, same_length: bool, scale: float,
    block_q: int, block_k: int, interpret: bool,
):
    """Returns (dq, dk, dv, drk, drw, drr)."""
    b, qlen, h, dh = q.shape
    klen = k.shape[1]
    block_q = min(block_q, qlen)
    block_k = min(block_k, klen)

    qh, kh, vh, rkh, rw, rr, rklen = _prep_inputs(
        q, k, v, rk, r_w_bias, r_r_bias, qlen, klen, dh, b, h)
    do = g.transpose(0, 2, 1, 3).reshape(b * h, qlen, dh)
    oh = out.transpose(0, 2, 1, 3).reshape(b * h, qlen, dh)
    delta = jnp.sum(
        do.astype(jnp.float32) * oh.astype(jnp.float32), axis=-1
    )[:, None, :]  # [bh, 1, qlen]

    common = dict(qlen=qlen, klen=klen, mem_len=mem_len,
                  same_length=same_length, scale=scale)
    full = lambda n: pl.BlockSpec((None, n, dh), lambda bh, i: (bh, 0, 0))
    stat = pl.BlockSpec((None, 1, qlen), lambda bh, i: (bh, 0, 0))

    # ---- dq (+ the two bias components) ---------------------------------
    dq_kernel = functools.partial(
        _rel_attention_bwd_dq_kernel, block_k=block_k, **common)
    qblk = pl.BlockSpec((None, block_q, dh), lambda bh, i: (bh, i, 0))
    stat_blk = pl.BlockSpec((None, 1, block_q), lambda bh, i: (bh, 0, i))
    dq_ac, dq_bd = pl.pallas_call(
        dq_kernel,
        grid=(b * h, qlen // block_q),
        in_specs=[qblk, full(klen), full(klen), full(rklen),
                  full(1), full(1), qblk, stat_blk, stat_blk, stat_blk],
        out_specs=(qblk, qblk),
        out_shape=(jax.ShapeDtypeStruct((b * h, qlen, dh), jnp.float32),
                   jax.ShapeDtypeStruct((b * h, qlen, dh), jnp.float32)),
        interpret=interpret,
    )(qh, kh, vh, rkh, rw, rr, do, m, l, delta)

    # ---- dk, dv, drk partials -------------------------------------------
    part_rows = qlen + block_k
    dkv_kernel = functools.partial(
        _rel_attention_bwd_dkv_kernel, block_q=block_q, **common)
    kblk = pl.BlockSpec((None, block_k, dh), lambda bh, j: (bh, j, 0))
    nk = klen // block_k
    dk, dv, drk_parts = pl.pallas_call(
        dkv_kernel,
        grid=(b * h, nk),
        in_specs=[full(qlen), kblk, kblk, full(rklen),
                  full(1), full(1), full(qlen), stat, stat, stat],
        out_specs=(kblk, kblk,
                   pl.BlockSpec((None, None, part_rows, dh),
                                lambda bh, j: (bh, j, 0, 0))),
        out_shape=(jax.ShapeDtypeStruct((b * h, klen, dh), jnp.float32),
                   jax.ShapeDtypeStruct((b * h, klen, dh), jnp.float32),
                   jax.ShapeDtypeStruct((b * h, nk, part_rows, dh),
                                        jnp.float32)),
        scratch_shapes=[pltpu.VMEM((part_rows, dh), jnp.float32)],
        interpret=interpret,
    )(qh, kh, vh, rkh, rw, rr, do, m, l, delta)

    # assemble drk: partial j covers padded-rk rows [j*bk, j*bk + part_rows).
    # part_rows = qlen + bk is a whole number of bk-slabs (qlen % bk == 0 by
    # pallas_applicable), and slab t of partial j lands on output slab j + t
    # — same-t slabs never overlap across partials, so the band-overlap sum
    # is nt pads + one fused add (a single pass over the partials) instead
    # of nk read-modify-write sweeps of the full [bh, rklen, dh] buffer.
    if qlen % block_k == 0:
        nt = part_rows // block_k
        slabs = drk_parts.reshape(b * h, nk, nt, block_k, dh)
        drk_full = sum(
            jnp.pad(
                slabs[:, :, t].reshape(b * h, nk * block_k, dh),
                ((0, 0), (t * block_k, rklen - (nk + t) * block_k), (0, 0)))
            for t in range(nt))
    else:  # uneven blocks (block_q < block_k): rare, keep the slow path
        drk_full = jnp.zeros((b * h, rklen, dh), jnp.float32)
        for j in range(nk):
            drk_full = jax.lax.dynamic_update_slice(
                drk_full,
                jax.lax.dynamic_slice(
                    drk_full, (0, j * block_k, 0), (b * h, part_rows, dh)
                ) + drk_parts[:, j],
                (0, j * block_k, 0))
    drk = drk_full[:, :klen].reshape(b, h, klen, dh).sum(axis=0)
    drk = drk.transpose(1, 0, 2)  # [klen, h, dh]

    dq = (dq_ac + dq_bd).reshape(b, h, qlen, dh).transpose(0, 2, 1, 3)
    drw = dq_ac.reshape(b, h, qlen, dh).sum(axis=(0, 2))
    drr = dq_bd.reshape(b, h, qlen, dh).sum(axis=(0, 2))
    dk_out = dk.reshape(b, h, klen, dh).transpose(0, 2, 1, 3)
    dv_out = dv.reshape(b, h, klen, dh).transpose(0, 2, 1, 3)
    return (dq.astype(q.dtype), dk_out.astype(k.dtype),
            dv_out.astype(v.dtype), drk.astype(rk.dtype),
            drw.astype(r_w_bias.dtype), drr.astype(r_r_bias.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def pallas_rel_attention(q, k, v, rk, r_w_bias, r_r_bias,
                         mem_len, same_length, scale,
                         block_q=DEFAULT_BLOCK_Q, block_k=DEFAULT_BLOCK_K,
                         interpret=False):
    return _pallas_rel_attention_fwd_impl(
        q, k, v, rk, r_w_bias, r_r_bias, mem_len=mem_len,
        same_length=same_length, scale=scale, block_q=block_q,
        block_k=block_k, interpret=interpret)


def pallas_anylen_applicable(qlen: int, klen: int,
                             block: int = DEFAULT_BLOCK_Q) -> bool:
    """The padding wrapper below handles any qlen as long as the memory
    prefix is block-aligned (it is: mem_len 1024 or 0)."""
    mlen = klen - qlen
    d = (-qlen) % block
    return (mlen % block == 0 and qlen >= 64
            and (klen + d) >= 2 * block)


def pallas_rel_attention_anylen(
    q, k, v, rk, r_w_bias, r_r_bias, mem_len, same_length, scale,
    block: int = DEFAULT_BLOCK_Q, interpret: bool = False,
):
    """Arbitrary-qlen wrapper: pad queries AND keys by the same amount (so
    the memory offset is unchanged), run the fused kernel, slice real rows.

    Safe by construction: padded keys sit past every real query's causal
    horizon (col > row + mlen) so they are masked; padded query rows compute
    garbage that is discarded, and their zero cotangents contribute nothing
    in backward. The rk table gains zero rows at the front for distances
    only garbage rows touch."""
    b, qlen, h, dh = q.shape
    klen = k.shape[1]
    d = (-qlen) % block
    if d == 0 and pallas_applicable(qlen, klen, block, block):
        return pallas_rel_attention(
            q, k, v, rk, r_w_bias, r_r_bias, mem_len, same_length, scale,
            block, block, interpret)
    assert pallas_anylen_applicable(qlen, klen, block), (qlen, klen)
    qp = jnp.pad(q, ((0, 0), (0, d), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, d), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, d), (0, 0), (0, 0)))
    rkp = jnp.pad(rk, ((d, 0), (0, 0), (0, 0)))  # front: larger distances
    out = pallas_rel_attention(
        qp, kp, vp, rkp, r_w_bias, r_r_bias, mem_len, same_length, scale,
        block, block, interpret)
    return out[:, :qlen]


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
    from jax.ad_checkpoint import checkpoint_name

    out, (m, l) = _pallas_rel_attention_fwd_impl(
        q, k, v, rk, r_w_bias, r_r_bias, mem_len=mem_len,
        same_length=same_length, scale=scale, block_q=block_q,
        block_k=block_k, interpret=interpret, with_stats=True)
    # name the kernel outputs so remat policies can elect to SAVE them:
    # without this, jax.checkpoint re-runs the whole forward kernel in the
    # backward pass just to rebuild (out, m, l) (~16 MB/layer at the 1.2B
    # train shape buys back a full kernel invocation per layer per step)
    out = checkpoint_name(out, "pallas_attn_out")
    m = checkpoint_name(m, "pallas_attn_m")
    l = checkpoint_name(l, "pallas_attn_l")
    return out, (q, k, v, rk, r_w_bias, r_r_bias, out, m, l)


def _bwd(mem_len, same_length, scale, block_q, block_k, interpret,
         residuals, g):
    q, k, v, rk, r_w_bias, r_r_bias, out, m, l = residuals
    return _pallas_rel_attention_bwd_impl(
        q, k, v, rk, r_w_bias, r_r_bias, out, m, l, g,
        mem_len=mem_len, same_length=same_length, scale=scale,
        block_q=block_q, block_k=block_k, interpret=interpret)


pallas_rel_attention.defvjp(_fwd, _bwd)
