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
stacked buffer — there is no XLA-level slice at all. Per (batch row,
key-block) grid step it computes all heads' scores with one MXU dot
against a block-diagonal query matrix (an r1 attempt that reduced per-head
with VPU lane ops measured SLOWER than XLA; everything here is MXU or
lane-wise), runs online softmax in the ``[H, bm]`` layout (lane-dim
reductions only, no transposes), and accumulates P@V into an ``[H, H*Dh]``
f32 scratch whose diagonal blocks are extracted once at the end.

The relative-position BD term and the ring masking are batch-cheap
(``[B, H, M]``) and stay in XLA: the caller folds ``rel_shift``-at-q==1
(identity), the cursor rotation and the banned-slot mask into a single
additive f32 ``bias`` input. The new token's self-column (distance-0
score against k_x/v_x) is merged outside in a two-term online-softmax
epilogue (``combine_self_column``), so the kernel never sees k_x/v_x.

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


def flash_ring_applicable(mem_len: int, n_head: int, d_head: int,
                          block_m: int = DEFAULT_BLOCK_M) -> bool:
    """Real-chip lowering constraints; anything else falls back to XLA."""
    bm = min(block_m, mem_len)
    return (
        mem_len % bm == 0
        and d_head % 128 == 0          # lane-aligned head slices
        and n_head % 8 == 0            # f32 sublane tile in [H, bm] scores
        and (n_head * d_head) % 128 == 0
    )


def _kernel_impl(lidx_ref, k_ref, v_ref, qw_ref, bias_ref,
                 o_ref, om_ref, ol_ref, acc_ref, m_ref, l_ref, *,
                 n_blocks: int, n_head: int, d_head: int, scale: float):
    i = pl.program_id(1)
    hd = n_head * d_head

    @pl.when(i == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # block-diagonal query: qbd[g, h*Dh+d] = qw[h, d] if h == g else 0 —
    # one [H, HD] x [bm, HD]^T MXU dot then yields every head's scores.
    # Arithmetic masking (multiply, not where) and a fresh iota per use
    # site: Mosaic can't relayout a shared i1 mask between a replicated
    # broadcast and the emit reduction below.
    def _diag(dtype):
        row = jax.lax.broadcasted_iota(jnp.int32, (n_head, hd), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (n_head, hd), 1)
        return (col // d_head == row).astype(dtype)

    qbd = jnp.broadcast_to(qw_ref[0], (n_head, hd)) * _diag(qw_ref.dtype)

    k_blk = k_ref[0, 0]                                   # [bm, HD]
    s = jax.lax.dot_general(
        qbd, k_blk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # [H, bm]
    s = s * scale + bias_ref[0]

    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)

    v_blk = v_ref[0, 0]
    pv = jax.lax.dot_general(
        p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [H, HD]
    acc_ref[...] = acc_ref[...] * alpha + pv
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(i == n_blocks - 1)
    def _emit():
        o_ref[...] = jnp.sum(
            acc_ref[...] * _diag(jnp.float32), axis=0,
            keepdims=True)[None]
        om_ref[...] = m_ref[:, :1][None]
        ol_ref[...] = l_ref[:, :1][None]


@functools.partial(
    jax.jit,
    static_argnames=("n_head", "d_head", "scale", "block_m", "interpret"))
def flash_ring_decode(
    k2: jax.Array,          # [L, B, M, H*Dh] bf16 (stacked ring cache)
    v2: jax.Array,          # [L, B, M, H*Dh] bf16
    qw_flat: jax.Array,     # [B, H*Dh] bf16 — (q + r_w_bias), flattened
    bias: jax.Array,        # [B, H, M] f32 — scaled BD term, ring order,
                            #   NEG_INF at banned slots
    lidx: jax.Array,        # [] or [1] int32 — layer to read
    *,
    n_head: int, d_head: int, scale: float,
    block_m: int = DEFAULT_BLOCK_M, interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Cache-column attention for one decode token over one layer's ring.

    Returns ``(o_unnorm [B, H*Dh] f32, m [B, H, 1] f32, l [B, H, 1] f32)``
    — the UNNORMALIZED online-softmax accumulator and its row stats; fold
    in the self column with :func:`combine_self_column`.
    """
    L, B, M, HD = k2.shape
    assert HD == n_head * d_head, (HD, n_head, d_head)
    bm = min(block_m, M)
    assert M % bm == 0, (M, bm)
    nm = M // bm
    lidx = jnp.reshape(lidx.astype(jnp.int32), (1,))

    grid = (B, nm)
    kv_spec = pl.BlockSpec(
        (1, 1, bm, HD), lambda b, i, l: (l[0], b, i, 0))
    qw_spec = pl.BlockSpec((1, 1, HD), lambda b, i, l: (b, 0, 0))
    bias_spec = pl.BlockSpec((1, n_head, bm), lambda b, i, l: (b, 0, i))
    o_spec = pl.BlockSpec((1, 1, HD), lambda b, i, l: (b, 0, 0))
    stat_spec = pl.BlockSpec((1, n_head, 1), lambda b, i, l: (b, 0, 0))

    out = pl.pallas_call(
        functools.partial(
            _kernel_impl, n_blocks=nm, n_head=n_head, d_head=d_head,
            scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[kv_spec, kv_spec, qw_spec, bias_spec],
            out_specs=[o_spec, stat_spec, stat_spec],
            scratch_shapes=[
                pltpu.VMEM((n_head, HD), jnp.float32),    # acc
                pltpu.VMEM((n_head, 128), jnp.float32),   # running max
                pltpu.VMEM((n_head, 128), jnp.float32),   # running denom
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, HD), jnp.float32),
            jax.ShapeDtypeStruct((B, n_head, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, n_head, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(lidx, k2, v2, qw_flat.reshape(B, 1, HD), bias)
    return out[0][:, 0], out[1], out[2]


def combine_self_column(
    o_unnorm: jax.Array,    # [B, H*Dh] f32 from the kernel
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
    B = o_unnorm.shape[0]
    o = o_unnorm.reshape(B, n_head, d_head)
    m = m[..., 0]                                          # [B, H]
    l = l[..., 0]
    m_t = jnp.maximum(m, s_x)
    a_cache = jnp.exp(m - m_t)[..., None]
    a_self = jnp.exp(s_x - m_t)[..., None]
    num = o * a_cache + a_self * v_x.astype(jnp.float32)
    den = l[..., None] * a_cache + a_self
    return num / den
