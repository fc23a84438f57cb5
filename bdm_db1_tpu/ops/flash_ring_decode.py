"""Fused single-token ring-cache decode attention (Pallas, TPU).

The XLA ring-decode path (models/transformer_xl.py, RelMultiHeadAttn ring
branch) runs inside an ``nn.scan`` over layers whose K/V caches are
scanned-over inputs ``[L, B, M, H, Dh]``: every loop iteration XLA stages
the layer's 2x167 MB (at 1.2B b40) K/V slice out of the stacked buffer
(read + write) before the score/PV dots read it again — the cache bytes
cross HBM ~3x per forward. xprof at 1.2B b40: 73.5 ms/env-step of
``dynamic-slice`` staging fusions alone (PERFORMANCE.md, decode roofline).

This kernel streams the cache exactly once: it takes the FULL stacked
cache (a broadcast scan argument) plus the layer index as a scalar-prefetch
operand, so the per-layer block is DMA'd HBM->VMEM directly out of the
stacked buffer — there is no XLA-level slice at all. The cache stays in
its native ``[L, B, M, H, Dh]`` layout: a head-dim-merging reshape outside
the kernel is NOT a bitcast under TPU tiling (XLA materializes a full
3.75 GB cache copy per array, memory_analysis-verified), while merging the
LEADING dims of the loaded block to ``[bm*H, Dh]`` inside the kernel is
layout-free.

Two kernel designs measured SLOWER than this one and are intentionally
absent: (r1) per-(b, h) VPU lane reductions; (r3) a per-head loop of 32
``[1, Dh] x [Dh, bm]`` MXU dots per grid step — at one query row per dot
the MXU spends ~16x longer loading K/V as weights than computing, and the
strided ``[bm, h, :]`` VMEM slices gather one sublane row at a time
(xprof: 2.26 ms/call vs the 0.5 ms roofline). Instead each grid step runs
ONE all-pairs dot ``[bm*H, Dh] x [Dh, H]`` (every key row scored against
every head's query), masks the off-diagonal (key-head != query-head) rows
to -inf, and lets the column softmax + the ``[bm*H, H]^T x [bm*H, Dh]``
PV contraction consume the full matrix — off-diagonal rows softmax to
zero weight, so the junk pairs never reach the output. The H-fold extra
MXU work is free next to the HBM stream (attention arithmetic intensity
at q == 1 is ~1 FLOP/byte).

The kernel is stateless per grid step (no online-softmax carry): each
(batch row, key-block) emits unnormalized partial output + (max, denom)
row stats, and the wrapper merges the nm = M/bm blocks in XLA (a few
hundred KB — negligible). The relative-position BD term and ring masking
fold into an additive f32 ``bias`` input built by the caller
(``rel_shift`` at q == 1 is the identity; the cursor rotation and the
banned-slot mask are batch-cheap in XLA). The new token's self-column
merges the same way via :func:`combine_self_column`, so the kernel never
sees k_x/v_x.

Semantics are those of the reference's masked fp32 softmax attention
(reference: src/model/transformer_xl.py:160-220) restricted to qlen == 1;
parity with the XLA ring branch is enforced by tests/test_flash_decode.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
DEFAULT_BLOCK_M = 512


def rep_rows_mask(bm: int, n_head: int, n_q: int) -> "jnp.ndarray":
    """[bm*H, Q*H] f32 additive head mask from a tiny [H, Q*H] tile:
    0.0 where the column's query-head (col % H, (q, h) column order)
    equals the row's key-head, NEG_INF elsewhere. The pattern is
    period-H constant over the key positions, so it broadcasts over a
    new leading bm dim + leading-dim merge (layout-free) instead of
    being rebuilt by iota/mod/compare/select passes over the full
    [bm*H, Q*H] score matrix on every grid step."""
    qh = n_q * n_head
    h_r = jax.lax.broadcasted_iota(jnp.int32, (n_head, qh), 0)
    h_q = jax.lax.broadcasted_iota(jnp.int32, (n_head, qh), 1) % n_head
    tile = jnp.where(h_r == h_q, 0.0, NEG_INF).astype(jnp.float32)
    return jnp.broadcast_to(
        tile[None], (bm, n_head, qh)).reshape(bm * n_head, qh)


def flash_ring_applicable(mem_len: int, n_head: int, d_head: int,
                          block_m: int = DEFAULT_BLOCK_M) -> bool:
    """Real-chip lowering constraints; anything else falls back to XLA."""
    bm = min(block_m, mem_len)
    return (
        mem_len % bm == 0
        and d_head % 128 == 0          # lane-aligned per-head value rows
        and n_head % 8 == 0            # sublane-even head replication
    )


def _decode_core(k_ref, v_ref, qwt_ref, bias_ref, ks_ref, vs_ref,
                 o_ref, om_ref, ol_ref, *, n_head: int, d_head: int):
    bm = k_ref.shape[2]
    rows = bm * n_head
    quantized = ks_ref is not None
    cdtype = qwt_ref.dtype

    # [bm, H, Dh] -> [bm*H, Dh]: leading-dim merge, layout-free in VMEM.
    # int8 cache: the convert is in-VMEM (int8 values are exact in bf16);
    # the per-(position, head) dequant scale lands on the SCORES below —
    # this is what the XLA int8 path cannot do without materializing an
    # f32 cache copy per layer, and why int8 was slower at equal batch
    # there (PERFORMANCE.md) while here HBM reads 1 byte/elem.
    k2 = k_ref[0, 0].reshape(rows, d_head)
    if quantized:
        k2 = k2.astype(cdtype)
    # all-pairs scores: row (m, h) x every head's query (scale pre-folded
    # into qwt by the wrapper)
    s_all = jax.lax.dot_general(
        k2, qwt_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [bm*H, H]

    # bias lands on the diagonal (key-head == query-head) entries; the
    # sublane-replicated expansion is layout-free and its off-diagonal
    # values are junk that the mask below kills. (The dequant scales use
    # the same expansion: a direct [bm, H] -> [bm*H, 1] reshape would move
    # lanes into sublanes — a relayout Mosaic rejects.)
    def rep(x2d):  # [bm, H] -> [bm*H, H], value at (m, h_r | h_q) = x[m, h_q]
        return jnp.broadcast_to(
            x2d[:, None, :], (bm, n_head, n_head)).reshape(rows, n_head)

    bias_rep = rep(bias_ref[0])
    if quantized:
        # on the surviving diagonal h_q == h_r, so this IS the row scale
        s_all = s_all * rep(ks_ref[0, 0])
    # additive off-diagonal mask, broadcast from an [H, H] tile: the
    # (key-head != query-head) pattern is period-H constant, so building
    # it full-size from two iota/mod/compare/select passes over the
    # [rows, H] f32 matrix every grid step is pure VPU waste. Adding
    # NEG_INF instead of where-selecting it is output-equal: valid
    # entries gain exactly 0.0, junk lands ~-1e30 and underflows the
    # softmax exp to exactly 0 whenever its block has any live key row
    # (an all-banned block is killed by the wrapper's w = 0 merge in
    # both formulations).
    s_m = s_all + bias_rep + rep_rows_mask(bm, n_head, 1)

    # column softmax over all bm*H rows == per-head softmax over its bm
    # keys: off-diagonal rows sit at -inf and get exactly zero weight
    m_blk = jnp.max(s_m, axis=0, keepdims=True)           # [1, H]
    p = jnp.exp(s_m - m_blk)                              # [bm*H, H]
    l_blk = jnp.sum(p, axis=0, keepdims=True)             # [1, H]

    v2 = v_ref[0, 0].reshape(rows, d_head)
    if quantized:
        # V dequant scale folds into the PV operand per key row — NOT into
        # the denominator l (normalization uses the raw softmax weights).
        # Off-diagonal p entries are exactly zero, so the junk replicated
        # scale values multiply zeros.
        v2 = v2.astype(cdtype)
        p = p * rep(vs_ref[0, 0])
    o_blk = jax.lax.dot_general(
        p.astype(v2.dtype), v2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [H, Dh]

    o_ref[...] = o_blk[None, None]
    om_ref[...] = m_blk[None, None]
    ol_ref[...] = l_blk[None, None]


def _kernel_impl(lidx_ref, k_ref, v_ref, qwt_ref, bias_ref,
                 o_ref, om_ref, ol_ref, *, n_head: int, d_head: int):
    _decode_core(k_ref, v_ref, qwt_ref, bias_ref, None, None,
                 o_ref, om_ref, ol_ref, n_head=n_head, d_head=d_head)


def _kernel_impl_q(lidx_ref, k_ref, v_ref, ks_ref, vs_ref, qwt_ref,
                   bias_ref, o_ref, om_ref, ol_ref, *, n_head: int,
                   d_head: int):
    _decode_core(k_ref, v_ref, qwt_ref, bias_ref, ks_ref, vs_ref,
                 o_ref, om_ref, ol_ref, n_head=n_head, d_head=d_head)


def flash_ring_decode(
    k_cache: jax.Array,     # [L, B, M, H, Dh] (stacked ring cache)
    v_cache: jax.Array,     # [L, B, M, H, Dh]
    qw: jax.Array,          # [B, H, Dh] — (q + r_w_bias), compute dtype
    bias: jax.Array,        # [B, H, M] f32 — scaled BD term, ring order,
                            #   NEG_INF at banned slots
    lidx: jax.Array,        # [] or [1] int32 — layer to read
    k_scale: jax.Array = None,  # [L, B, M, H] f32 — int8 dequant scales
    v_scale: jax.Array = None,  # [L, B, M, H] f32
    *,
    n_head: int, d_head: int, scale: float,
    block_m: int = DEFAULT_BLOCK_M, interpret: bool = False,
    mesh=None, data_axis: str = "data", model_axis: str = "model",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Cache-column attention for one decode token over one layer's ring.

    With ``k_scale``/``v_scale`` the caches are int8 and dequantization
    happens in-kernel (scales on the scores / PV operand, never on the
    cache read itself) — HBM streams the cache at 1 byte/element.

    With ``mesh`` (sharded decode, eval/decode.py ActionDecoder(mesh=...))
    the kernel runs under a partial-manual ``jax.shard_map`` over
    (``data_axis``, ``model_axis``): batch rows split over data, heads
    over model — per-shard the computation is fully head/row independent
    (the all-pairs dot scores only same-shard head pairs), so the manual
    region needs NO collectives and each chip streams only its H/tp head
    slice of the cache. A pallas_call is an opaque unit to the pjit
    partitioner (it would force its operands replicated); the shard_map
    is what lets the fused kernel serve on a TP×DP mesh at all. Callers
    gate on per-shard applicability (n_head/tp must keep the kernel's
    sublane-even head replication, see ``flash_ring_applicable``).

    Returns ``(o_unnorm [B, H, Dh] f32, m [B, H, 1] f32, l [B, H, 1] f32)``
    — the UNNORMALIZED online-softmax accumulator and its row stats; fold
    in the self column with :func:`combine_self_column`.
    """
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        tp = mesh.shape.get(model_axis, 1)
        dp = mesh.shape.get(data_axis, 1)
        L, B, M, H, Dh = k_cache.shape
        assert H % tp == 0, (H, tp)
        # batch that doesn't divide the data axis stays replicated — same
        # fallback rule as ActionDecoder._dev / ring_cache_shardings
        bax = data_axis if (dp > 1 and B % dp == 0) else None
        kv_s = P(None, bax, None, model_axis, None)
        sc_s = P(None, bax, None, model_axis)
        row_s = P(bax, model_axis, None)   # qw/bias in, o/m/l out
        lidx = jnp.reshape(lidx.astype(jnp.int32), (1,))
        inner = functools.partial(
            _flash_ring_decode_local, n_head=H // tp, d_head=d_head,
            scale=scale, block_m=block_m, interpret=interpret)
        manual = {data_axis, model_axis} & set(mesh.axis_names)
        if k_scale is not None:
            return jax.shard_map(
                lambda k, v, q, b, l, ks, vs: inner(k, v, q, b, l, ks, vs),
                mesh=mesh, axis_names=manual, check_vma=False,
                in_specs=(kv_s, kv_s, row_s, row_s, P(), sc_s, sc_s),
                out_specs=(row_s, row_s, row_s),
            )(k_cache, v_cache, qw, bias, lidx, k_scale, v_scale)
        return jax.shard_map(
            lambda k, v, q, b, l: inner(k, v, q, b, l),
            mesh=mesh, axis_names=manual, check_vma=False,
            in_specs=(kv_s, kv_s, row_s, row_s, P()),
            out_specs=(row_s, row_s, row_s),
        )(k_cache, v_cache, qw, bias, lidx)
    return _flash_ring_decode_local(
        k_cache, v_cache, qw, bias, lidx, k_scale, v_scale,
        n_head=n_head, d_head=d_head, scale=scale, block_m=block_m,
        interpret=interpret)


@functools.partial(
    jax.jit,
    static_argnames=("n_head", "d_head", "scale", "block_m", "interpret"))
def _flash_ring_decode_local(
    k_cache: jax.Array,
    v_cache: jax.Array,
    qw: jax.Array,
    bias: jax.Array,
    lidx: jax.Array,
    k_scale: jax.Array = None,
    v_scale: jax.Array = None,
    *,
    n_head: int, d_head: int, scale: float,
    block_m: int = DEFAULT_BLOCK_M, interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Single-shard body of :func:`flash_ring_decode` (the pallas_call and
    its XLA block-merge epilogue)."""
    L, B, M, H, Dh = k_cache.shape
    assert (H, Dh) == (n_head, d_head), (k_cache.shape, n_head, d_head)
    quantized = k_scale is not None
    bm = min(block_m, M)
    assert M % bm == 0, (M, bm)
    nm = M // bm
    lidx = jnp.reshape(lidx.astype(jnp.int32), (1,))

    # scale folds into the (transposed) query operand; bias arrives scaled
    qwt = (jnp.asarray(scale, qw.dtype) * qw).transpose(0, 2, 1)  # [B,Dh,H]
    bias_t = bias.transpose(0, 2, 1)                              # [B,M,H]

    grid = (B, nm)
    kv_spec = pl.BlockSpec(
        (1, 1, bm, H, Dh), lambda b, i, l: (l[0], b, i, 0, 0))
    sc_spec = pl.BlockSpec((1, 1, bm, H), lambda b, i, l: (l[0], b, i, 0))
    qwt_spec = pl.BlockSpec((1, Dh, H), lambda b, i, l: (b, 0, 0))
    bias_spec = pl.BlockSpec((1, bm, H), lambda b, i, l: (b, i, 0))
    o_spec = pl.BlockSpec((1, 1, H, Dh), lambda b, i, l: (b, i, 0, 0))
    stat_spec = pl.BlockSpec((1, 1, 1, H), lambda b, i, l: (b, i, 0, 0))

    if quantized:
        kern = functools.partial(_kernel_impl_q, n_head=n_head,
                                 d_head=d_head)
        in_specs = [kv_spec, kv_spec, sc_spec, sc_spec, qwt_spec, bias_spec]
        operands = (lidx, k_cache, v_cache, k_scale, v_scale, qwt, bias_t)
    else:
        kern = functools.partial(_kernel_impl, n_head=n_head, d_head=d_head)
        in_specs = [kv_spec, kv_spec, qwt_spec, bias_spec]
        operands = (lidx, k_cache, v_cache, qwt, bias_t)

    o_part, m_part, l_part = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=[o_spec, stat_spec, stat_spec],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, nm, H, Dh), jnp.float32),
            jax.ShapeDtypeStruct((B, nm, 1, H), jnp.float32),
            jax.ShapeDtypeStruct((B, nm, 1, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*operands)

    # merge the nm block partials in XLA — a few hundred KB, negligible
    # next to the GB-scale cache stream the kernel just did
    m_p = m_part[:, :, 0]                                  # [B, nm, H]
    m_f = jnp.max(m_p, axis=1)                             # [B, H]
    w = jnp.exp(m_p - m_f[:, None, :])                     # [B, nm, H]
    o_un = jnp.einsum("bnhd,bnh->bhd", o_part, w)
    l_f = jnp.einsum("bnh,bnh->bh", l_part[:, :, 0], w)
    return o_un, m_f[..., None], l_f[..., None]


def _prime_core(k_ref, v_ref, qw_ref, bias_ref, ks_ref, vs_ref,
                o_ref, om_ref, ol_ref, *, n_head: int):
    # per-head flash tiles in the [Q, bm] orientation of ops/
    # pallas_attention.py (scores "nt", PV "nn" — both MXU-native); the
    # strided [.., h, :] VMEM slices cost ~1 vreg row per cycle, which at
    # q >= 2 amortizes over the q query rows (xprof: 1.21 ms/layer-call at
    # q 18 b40 vs the XLA ring branch's ~2.9 ms)
    quantized = ks_ref is not None
    cdtype = qw_ref.dtype
    for h in range(n_head):
        k_h = k_ref[0, 0, :, h, :]                        # [bm, Dh]
        if quantized:
            k_h = k_h.astype(cdtype)
        s = jax.lax.dot_general(
            qw_ref[0, h], k_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [Q, bm]
        if quantized:
            # scales arrive [.., H, bm] so this slice is lane-contiguous
            s = s * ks_ref[0, 0, h][None, :]
        s = s + bias_ref[0, h]
        m_b = jnp.max(s, axis=1, keepdims=True)           # [Q, 1]
        p = jnp.exp(s - m_b)
        l_b = jnp.sum(p, axis=1, keepdims=True)
        v_h = v_ref[0, 0, :, h, :]
        if quantized:
            # V dequant scale on the PV operand, not the denominator l
            v_h = v_h.astype(cdtype)
            p = p * vs_ref[0, 0, h][None, :]
        pv = jax.lax.dot_general(
            p.astype(v_h.dtype), v_h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [Q, Dh]
        o_ref[0, 0, h] = pv
        om_ref[0, 0, h] = m_b
        ol_ref[0, 0, h] = l_b


def _prime_kernel(lidx_ref, k_ref, v_ref, qw_ref, bias_ref,
                  o_ref, om_ref, ol_ref, *, n_head: int):
    _prime_core(k_ref, v_ref, qw_ref, bias_ref, None, None,
                o_ref, om_ref, ol_ref, n_head=n_head)


def _prime_kernel_q(lidx_ref, k_ref, v_ref, ks_ref, vs_ref, qw_ref,
                    bias_ref, o_ref, om_ref, ol_ref, *, n_head: int):
    _prime_core(k_ref, v_ref, qw_ref, bias_ref, ks_ref, vs_ref,
                o_ref, om_ref, ol_ref, n_head=n_head)


MAX_PRIME_Q = 32


def diag_sel_tile(n_head: int, n_q: int) -> "jnp.ndarray":
    """[H, Q*H] f32 0/1 tile: 1 where the column's query-head equals the
    row's key-head ((q, h) column order) — the multiplicative sibling of
    :func:`rep_rows_mask`'s additive -inf tile."""
    qh = n_q * n_head
    h_r = jax.lax.broadcasted_iota(jnp.int32, (n_head, qh), 0)
    h_q = jax.lax.broadcasted_iota(jnp.int32, (n_head, qh), 1) % n_head
    return (h_r == h_q).astype(jnp.float32)


def _prime_ap_core(k_ref, v_ref, qwt_ref, bias_ref, ks_ref, vs_ref,
                   o_ref, om_ref, ol_ref, *, n_head: int, n_q: int,
                   compact: bool = False):
    """All-pairs prime: the q == 1 kernel's design generalized to Q*H
    columns — ONE wide MXU dot instead of the per-head loop's strided
    [.., h, :] VMEM slices (those gather ~1 vreg row/cycle and measured
    1.21 ms/layer-call at q 18 b40 vs the ~0.41 ms HBM floor). Columns are
    (query, head) ordered: col = q * H + h, so the query-head of a column
    is col % H (the q == 1 kernel's selector) and the int8 dequant scales
    replicate with ``pltpu.repeat`` (a lane tiling of the q == 1 kernel's
    sublane-replicated [rows, H] expansion)."""
    bm = k_ref.shape[2]
    d_head = k_ref.shape[4]
    rows = bm * n_head
    qh = n_q * n_head
    quantized = ks_ref is not None
    cdtype = qwt_ref.dtype

    def rep(x2d):  # [bm, H] -> [rows, H], value at (m, h_r | h) = x[m, h]
        return jnp.broadcast_to(
            x2d[:, None, :], (bm, n_head, n_head)).reshape(rows, n_head)

    def rep_q(x2d):  # [bm, H] -> [rows, Q*H], value at (m*H+h_r, q*H+h)
        return pltpu.repeat(rep(x2d), n_q, axis=1)  # = x[m, h]

    k2 = k_ref[0, 0].reshape(rows, d_head)
    if quantized:
        k2 = k2.astype(cdtype)
    s_all = jax.lax.dot_general(
        k2, qwt_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [rows, QH]

    if compact:
        # COMPACT SOFTMAX (xprof r5: the all-pairs design wastes 15/16
        # of the softmax VPU work on off-diagonal (key-head, query-head)
        # pairs — exp over [bm*H, Q*H] was the kernel's bound, not
        # bytes). Extract the valid diagonal into a 16x smaller
        # [bm, Q*H] matrix (mask-mult + sublane-group reduce), softmax
        # THAT, and expand the probabilities back for the PV dot with a
        # broadcast-mult. Output-equal with the additive-mask path: the
        # -1e30 junk entries there exp to exactly 0, here they are
        # never materialized; max/denoms agree because junk never wins
        # a max and contributes 0 to sums.
        sel = diag_sel_tile(n_head, n_q)                  # [H, QH] 0/1
        s_small = jnp.sum(
            s_all.reshape(bm, n_head, qh) * sel[None], axis=1)  # [bm, QH]
        if quantized:
            # K dequant scale per key row, lane-tiled to (q, h) columns
            s_small = s_small * pltpu.repeat(ks_ref[0, 0], n_q, axis=1)
        s_small = s_small + bias_ref[0]                   # [bm, QH]

        m_blk = jnp.max(s_small, axis=0, keepdims=True)   # [1, QH]
        p_small = jnp.exp(s_small - m_blk)
        l_blk = jnp.sum(p_small, axis=0, keepdims=True)   # [1, QH]
        if quantized:
            p_small = p_small * pltpu.repeat(vs_ref[0, 0], n_q, axis=1)
        sel_rows = jnp.broadcast_to(
            sel[None], (bm, n_head, qh)).reshape(rows, qh)
        p = jnp.broadcast_to(
            p_small[:, None, :], (bm, n_head, qh)).reshape(rows, qh) \
            * sel_rows
        v2 = v_ref[0, 0].reshape(rows, d_head)
        if quantized:
            v2 = v2.astype(cdtype)
        o_blk = jax.lax.dot_general(
            p.astype(v2.dtype), v2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [QH, Dh]
        o_ref[...] = o_blk[None, None]
        om_ref[...] = m_blk[None, None]
        ol_ref[...] = l_blk[None, None]
        return

    bias_rep = jnp.broadcast_to(
        bias_ref[0][:, None, :], (bm, n_head, qh)).reshape(rows, qh)
    if quantized:
        # K dequant scale per key row: on the surviving diagonal the
        # column's query-head equals the row head, so rep_q IS the row
        # scale there (junk elsewhere is masked off below)
        s_all = s_all * rep_q(ks_ref[0, 0])
    # additive off-diagonal mask from an [H, Q*H] tile (see
    # rep_rows_mask): replaces two full-matrix iota/mod passes, a
    # compare and a select over the [bm*H, Q*H] f32 scores — the widest
    # VPU object in the kernel — with one add; output-equal (valid
    # entries + 0.0, junk underflows exp to exactly 0, all-banned
    # blocks die in the wrapper's w = 0 merge either way)
    s_m = s_all + bias_rep + rep_rows_mask(bm, n_head, n_q)

    m_blk = jnp.max(s_m, axis=0, keepdims=True)           # [1, QH]
    p = jnp.exp(s_m - m_blk)
    l_blk = jnp.sum(p, axis=0, keepdims=True)             # [1, QH]

    v2 = v_ref[0, 0].reshape(rows, d_head)
    if quantized:
        # V dequant scale on the PV operand, never the denominator l;
        # off-diagonal p entries are exactly zero
        v2 = v2.astype(cdtype)
        p = p * rep_q(vs_ref[0, 0])
    o_blk = jax.lax.dot_general(
        p.astype(v2.dtype), v2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [QH, Dh]

    o_ref[...] = o_blk[None, None]
    om_ref[...] = m_blk[None, None]
    ol_ref[...] = l_blk[None, None]


def _prime_ap_kernel(lidx_ref, k_ref, v_ref, qwt_ref, bias_ref,
                     o_ref, om_ref, ol_ref, *, n_head: int, n_q: int,
                     compact: bool = False):
    _prime_ap_core(k_ref, v_ref, qwt_ref, bias_ref, None, None,
                   o_ref, om_ref, ol_ref, n_head=n_head, n_q=n_q,
                   compact=compact)


def _prime_ap_kernel_q(lidx_ref, k_ref, v_ref, ks_ref, vs_ref, qwt_ref,
                       bias_ref, o_ref, om_ref, ol_ref, *, n_head: int,
                       n_q: int, compact: bool = False):
    _prime_ap_core(k_ref, v_ref, qwt_ref, bias_ref, ks_ref, vs_ref,
                   o_ref, om_ref, ol_ref, n_head=n_head, n_q=n_q,
                   compact=compact)


def flash_ring_prime_ap(
    k_cache: jax.Array,     # [L, B, M, H, Dh] (stacked ring cache)
    v_cache: jax.Array,     # [L, B, M, H, Dh]
    qw: jax.Array,          # [B, H, Q, Dh] — (q + r_w_bias), compute dtype
    bias: jax.Array,        # [B, H, Q, M] f32 — scaled BD term, ring
                            #   order, NEG_INF at banned slots
    lidx: jax.Array,        # [] or [1] int32 — layer to read
    k_scale: jax.Array = None,  # [L, B, M, H] f32 — int8 dequant scales
                                #   (q == 1 layout; no caller transpose)
    v_scale: jax.Array = None,  # [L, B, M, H] f32
    *,
    n_head: int, d_head: int, scale: float,
    block_m: int = DEFAULT_BLOCK_M, interpret: bool = False,
    mesh=None, data_axis: str = "data", model_axis: str = "model",
    compact: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """All-pairs variant of :func:`flash_ring_prime`; handles exact-dtype
    AND int8(+scales) caches — the scales stay in the q == 1 kernel's
    [L, B, M, H] layout (``pltpu.repeat`` does the in-kernel [rows, Q*H]
    replication the per-head kernel needed a caller-side transpose for).

    With ``mesh`` (sharded decode) the whole function body — including
    the (q, h) column flattening, which is why pjit alone can't partition
    it over heads — runs under a partial-manual ``jax.shard_map``, exactly
    like :func:`flash_ring_decode`: every operand and output is head-major
    ([.., H, ..] axis split over ``model_axis``), batch rows over
    ``data_axis``, and per-shard the all-pairs dot only ever scores
    same-shard head pairs, so the manual region needs no collectives.

    Same contract as :func:`flash_ring_prime`: returns
    ``(o_unnorm [B, H, Q, Dh] f32, m [B, H, Q], l [B, H, Q])``.
    """
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        tp = mesh.shape.get(model_axis, 1)
        dp = mesh.shape.get(data_axis, 1)
        L, B, M, H, Dh = k_cache.shape
        assert H % tp == 0, (H, tp)
        bax = data_axis if (dp > 1 and B % dp == 0) else None
        kv_s = P(None, bax, None, model_axis, None)
        sc_s = P(None, bax, None, model_axis)
        q_s = P(bax, model_axis, None, None)    # qw/bias in, o out
        st_s = P(bax, model_axis, None)         # m/l out
        lidx = jnp.reshape(lidx.astype(jnp.int32), (1,))
        inner = functools.partial(
            _flash_ring_prime_ap_local, n_head=H // tp, d_head=d_head,
            scale=scale, block_m=block_m, interpret=interpret,
            compact=compact)
        manual = {data_axis, model_axis} & set(mesh.axis_names)
        if k_scale is not None:
            return jax.shard_map(
                lambda k, v, q, b, l, ks, vs: inner(k, v, q, b, l, ks, vs),
                mesh=mesh, axis_names=manual, check_vma=False,
                in_specs=(kv_s, kv_s, q_s, q_s, P(), sc_s, sc_s),
                out_specs=(q_s, st_s, st_s),
            )(k_cache, v_cache, qw, bias, lidx, k_scale, v_scale)
        return jax.shard_map(
            lambda k, v, q, b, l: inner(k, v, q, b, l),
            mesh=mesh, axis_names=manual, check_vma=False,
            in_specs=(kv_s, kv_s, q_s, q_s, P()),
            out_specs=(q_s, st_s, st_s),
        )(k_cache, v_cache, qw, bias, lidx)
    return _flash_ring_prime_ap_local(
        k_cache, v_cache, qw, bias, lidx, k_scale, v_scale,
        n_head=n_head, d_head=d_head, scale=scale, block_m=block_m,
        interpret=interpret, compact=compact)


@functools.partial(
    jax.jit,
    static_argnames=("n_head", "d_head", "scale", "block_m", "interpret",
                     "compact"))
def _flash_ring_prime_ap_local(
    k_cache: jax.Array,
    v_cache: jax.Array,
    qw: jax.Array,
    bias: jax.Array,
    lidx: jax.Array,
    k_scale: jax.Array = None,
    v_scale: jax.Array = None,
    *,
    n_head: int, d_head: int, scale: float,
    block_m: int = DEFAULT_BLOCK_M, interpret: bool = False,
    compact: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Single-shard body of :func:`flash_ring_prime_ap` (the (q, h) column
    flattening, the pallas_call, and its XLA block-merge epilogue)."""
    L, B, M, H, Dh = k_cache.shape
    Q = qw.shape[2]
    QH = Q * H
    assert (H, Dh) == (n_head, d_head), (k_cache.shape, n_head, d_head)
    assert 2 <= Q <= MAX_PRIME_Q, Q
    quantized = k_scale is not None
    if quantized:
        assert k_scale.shape == (L, B, M, H), k_scale.shape
    # adaptive block: the [bm*H, Q*H] f32 score/prob (and, quantized, the
    # two replicated scale) buffers plus the double-buffered K/V blocks
    # must fit ~16 MB VMEM with headroom
    n_big = 4 if quantized else 2
    bm = min(block_m, M)
    while bm > 64 and (bm * H * QH * 4 * n_big
                       + 4 * bm * H * Dh * k_cache.dtype.itemsize
                       ) > 10 * 2**20:
        bm //= 2
    assert M % bm == 0, (M, bm)
    nm = M // bm
    lidx = jnp.reshape(lidx.astype(jnp.int32), (1,))

    # scale folds into the transposed query operand; (q, h) column order
    qwt = (jnp.asarray(scale, qw.dtype)
           * qw).transpose(0, 3, 2, 1).reshape(B, Dh, QH)
    bias_t = bias.transpose(0, 3, 2, 1).reshape(B, M, QH)

    grid = (B, nm)
    kv_spec = pl.BlockSpec(
        (1, 1, bm, H, Dh), lambda b, i, l: (l[0], b, i, 0, 0))
    sc_spec = pl.BlockSpec((1, 1, bm, H), lambda b, i, l: (l[0], b, i, 0))
    qwt_spec = pl.BlockSpec((1, Dh, QH), lambda b, i, l: (b, 0, 0))
    bias_spec = pl.BlockSpec((1, bm, QH), lambda b, i, l: (b, i, 0))
    o_spec = pl.BlockSpec((1, 1, QH, Dh), lambda b, i, l: (b, i, 0, 0))
    stat_spec = pl.BlockSpec((1, 1, 1, QH), lambda b, i, l: (b, i, 0, 0))

    if quantized:
        kern = functools.partial(_prime_ap_kernel_q, n_head=n_head, n_q=Q,
                                 compact=compact)
        in_specs = [kv_spec, kv_spec, sc_spec, sc_spec, qwt_spec, bias_spec]
        operands = (lidx, k_cache, v_cache, k_scale, v_scale, qwt, bias_t)
    else:
        kern = functools.partial(_prime_ap_kernel, n_head=n_head, n_q=Q,
                                 compact=compact)
        in_specs = [kv_spec, kv_spec, qwt_spec, bias_spec]
        operands = (lidx, k_cache, v_cache, qwt, bias_t)

    o_part, m_part, l_part = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=[o_spec, stat_spec, stat_spec],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, nm, QH, Dh), jnp.float32),
            jax.ShapeDtypeStruct((B, nm, 1, QH), jnp.float32),
            jax.ShapeDtypeStruct((B, nm, 1, QH), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*operands)

    # (q, h) columns split back on leading dims in XLA
    m_p = m_part[:, :, 0].reshape(B, nm, Q, H)             # [B, nm, Q, H]
    m_f = jnp.max(m_p, axis=1).transpose(0, 2, 1)          # [B, H, Q]
    w = jnp.exp(m_p - m_f.transpose(0, 2, 1)[:, None])     # [B, nm, Q, H]
    o_r = o_part.reshape(B, nm, Q, H, Dh)
    o_un = jnp.einsum("bnqhd,bnqh->bhqd", o_r, w)
    l_f = jnp.einsum("bnqh,bnqh->bhq",
                     l_part[:, :, 0].reshape(B, nm, Q, H), w)
    return o_un, m_f, l_f


@functools.partial(
    jax.jit,
    static_argnames=("n_head", "d_head", "scale", "block_m", "interpret"))
def flash_ring_prime(
    k_cache: jax.Array,     # [L, B, M, H, Dh] (stacked ring cache)
    v_cache: jax.Array,     # [L, B, M, H, Dh]
    qw: jax.Array,          # [B, H, Q, Dh] — (q + r_w_bias), compute dtype
    bias: jax.Array,        # [B, H, Q, M] f32 — scaled BD term, ring
                            #   order, NEG_INF at banned slots
    lidx: jax.Array,        # [] or [1] int32 — layer to read
    k_scale_t: jax.Array = None,  # [L, B, H, M] f32 — int8 dequant scales,
                                  #   PRE-TRANSPOSED by the caller
    v_scale_t: jax.Array = None,  # [L, B, H, M] f32
    *,
    n_head: int, d_head: int, scale: float,
    block_m: int = DEFAULT_BLOCK_M, interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Cache-column attention for a small multi-token prime (2 <= Q <= 32)
    over one layer's ring — the per-env-step observation prime.

    With ``k_scale_t``/``v_scale_t`` the caches are int8, dequantized
    in-kernel (see :func:`flash_ring_decode`). The scales arrive in
    [L, B, H, M] order — head-major, so the kernel's per-head slice is
    lane-contiguous — and MUST be transposed by the caller OUTSIDE the
    layer scan (this function runs once per layer inside it; a transpose
    here would re-materialize the full scale buffers L times per forward).

    Returns ``(o_unnorm [B, H, Q, Dh] f32, m [B, H, Q], l [B, H, Q])``;
    fold in the new tokens' q x q self block with
    :func:`combine_new_columns`.
    """
    L, B, M, H, Dh = k_cache.shape
    Q = qw.shape[2]
    assert (H, Dh) == (n_head, d_head), (k_cache.shape, n_head, d_head)
    assert 2 <= Q <= MAX_PRIME_Q, Q
    quantized = k_scale_t is not None
    if quantized:
        assert k_scale_t.shape == (L, B, H, M), k_scale_t.shape
    bm = min(block_m, M)
    assert M % bm == 0, (M, bm)
    nm = M // bm
    lidx = jnp.reshape(lidx.astype(jnp.int32), (1,))
    qw = jnp.asarray(scale, qw.dtype) * qw     # fold the 1/sqrt(Dh) scale

    grid = (B, nm)
    kv_spec = pl.BlockSpec(
        (1, 1, bm, H, Dh), lambda b, i, l: (l[0], b, i, 0, 0))
    sc_spec = pl.BlockSpec((1, 1, H, bm), lambda b, i, l: (l[0], b, 0, i))
    qw_spec = pl.BlockSpec((1, H, Q, Dh), lambda b, i, l: (b, 0, 0, 0))
    bias_spec = pl.BlockSpec((1, H, Q, bm), lambda b, i, l: (b, 0, 0, i))
    o_spec = pl.BlockSpec((1, 1, H, Q, Dh), lambda b, i, l: (b, i, 0, 0, 0))
    stat_spec = pl.BlockSpec((1, 1, H, Q, 1), lambda b, i, l: (b, i, 0, 0, 0))

    if quantized:
        kern = functools.partial(_prime_kernel_q, n_head=n_head)
        in_specs = [kv_spec, kv_spec, sc_spec, sc_spec, qw_spec, bias_spec]
        operands = (lidx, k_cache, v_cache, k_scale_t, v_scale_t, qw, bias)
    else:
        kern = functools.partial(_prime_kernel, n_head=n_head)
        in_specs = [kv_spec, kv_spec, qw_spec, bias_spec]
        operands = (lidx, k_cache, v_cache, qw, bias)

    o_part, m_part, l_part = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=[o_spec, stat_spec, stat_spec],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, nm, H, Q, Dh), jnp.float32),
            jax.ShapeDtypeStruct((B, nm, H, Q, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, nm, H, Q, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*operands)

    m_p = m_part[..., 0]                                   # [B, nm, H, Q]
    m_f = jnp.max(m_p, axis=1)                             # [B, H, Q]
    w = jnp.exp(m_p - m_f[:, None])                        # [B, nm, H, Q]
    o_un = jnp.einsum("bnhqd,bnhq->bhqd", o_part, w)
    l_f = jnp.einsum("bnhq,bnhq->bhq", l_part[..., 0], w)
    return o_un, m_f, l_f


def combine_new_columns(
    o_unnorm: jax.Array,    # [B, H, Q, Dh] f32 from the prime kernel
    m: jax.Array,           # [B, H, Q] f32
    l: jax.Array,           # [B, H, Q] f32
    s_new: jax.Array,       # [B, H, Q, Q] f32 — scaled new-token scores,
                            #   NEG_INF at masked (anti-causal) entries
    v_x: jax.Array,         # [B, Q, H, Dh] — the new tokens' value rows
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Merge the new tokens' Q x Q self/causal block into the cache-column
    online-softmax partials — the q > 1 generalization of
    :func:`combine_self_column`. Returns [B, Q, H, Dh] f32."""
    m_t = jnp.maximum(m, jnp.max(s_new, axis=-1))          # [B, H, Q]
    w_c = jnp.exp(m - m_t)
    p_new = jnp.exp(s_new - m_t[..., None])                # [B, H, Q, Q]
    num = (o_unnorm * w_c[..., None]
           + jnp.einsum("bhij,bjhd->bhid",
                        p_new.astype(compute_dtype),
                        v_x.astype(compute_dtype)).astype(jnp.float32))
    den = l * w_c + jnp.sum(p_new, axis=-1)
    return (num / den[..., None]).transpose(0, 2, 1, 3)    # [B, Q, H, Dh]


def combine_self_column(
    o_unnorm: jax.Array,    # [B, H, Dh] f32 from the kernel
    m: jax.Array,           # [B, H, 1] f32
    l: jax.Array,           # [B, H, 1] f32
    s_x: jax.Array,         # [B, H] f32 — scaled self-column score
    v_x: jax.Array,         # [B, H, Dh] — the new token's value rows
    n_head: int, d_head: int,
) -> jax.Array:
    """Two-term online-softmax merge of the distance-0 self column.

    Equivalent to softmaxing over [cache columns | self] jointly: with the
    cache part's (max, denom, unnormalized out) and the single extra score
    s_x, rescale both sides to the joint max and renormalize.
    Returns [B, H, Dh] f32 attention output.
    """
    m = m[..., 0]                                          # [B, H]
    l = l[..., 0]
    m_t = jnp.maximum(m, s_x)
    a_cache = jnp.exp(m - m_t)[..., None]
    a_self = jnp.exp(s_x - m_t)[..., None]
    num = o_unnorm * a_cache + a_self * v_x.astype(jnp.float32)
    den = l[..., None] * a_cache + a_self
    return num / den
