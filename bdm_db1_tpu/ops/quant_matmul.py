"""int8-weight matmul (Pallas, TPU): y = x @ dequant(w).

Decode forwards are HBM-bound and re-read every trunk weight once per
forward (~2.15 GB bf16 at 1.2B — reference workload:
/root/reference/src/evaluation/evaluate_rl.py:177-258, one forward per
generated token). Storing the kernels int8 with per-output-channel scales
halves that stream; the catch is WHERE the dequant happens. An XLA-level
``w_int8.astype(bf16) * scale`` materializes a full-precision copy of the
weight in HBM (the exact failure mode the int8 KV cache hit before its
in-kernel dequant, PERFORMANCE.md), so this kernel converts int8 -> bf16
in VMEM, right after the DMA: HBM traffic stays 1 byte/element and the
MXU consumes bf16 operands.

Design: grid (nM, nN, nK) with K innermost; the [bk, bn] weight block is
DMA'd, converted, and matmul'd against the activation block x[m-block,
k-block]; f32 partial products accumulate in a VMEM scratch (revisited
for every k of one (m, n) tile), and the per-output-channel scale folds
in once on the LAST k step — scales are per-column, so scaling the f32
accumulator once is exact and cheaper than scaling every partial. Rows
tile too (bm): decode primes present B·q rows (10,240 at 1.2B b40 q256),
and a full-height output/acc block is a guaranteed Mosaic
kernel-vmem-stack OOM at that shape.

Per-channel (columnwise absmax / 127) symmetric quantization matches the
KV-cache scheme (models/transformer_xl.py quantize_kv_rows); biases stay
in their storage dtype and are added OUTSIDE (they are O(N) — the win is
the O(K*N) kernel bytes).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_weight(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8 quantization of a [K, N] kernel.

    Returns (w_int8 [K, N], scale [N] f32) with w ~= w_int8 * scale.
    """
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=0)                   # [N]
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(wf / scale[None, :]), -127, 127)
    return q.astype(jnp.int8), scale


def select_blocks(B0: int, K: int, N: int, block_m: int, block_k: int,
                  block_n: int, dtype) -> Tuple[int, int, int]:
    """Pick (bm, bk, bn) tile sizes for :func:`quant_matmul`.

    Row tile: every m-tile re-streams the entire [K, N] weight matrix from
    HBM — the traffic that dominates this kernel — so pick the tile that
    MINIMIZES the m-tile count (weight restreams), tiebreaking on padded
    rows (dead compute is cheap next to an extra full weight pass; slicing
    the pad off is free). Tiles must stay sublane-aligned (8 f32 / 16 bf16)
    or Mosaic can reject the block shape on the real chip.

    VMEM: the double-buffered x/w/out blocks plus the f32 accumulator must
    fit Mosaic's ~16 MB scoped VMEM with headroom. At decode-prime row
    counts (B = batch x q_chunk, e.g. 10,240 at 1.2B b40 q256) full-height
    blocks overflow by MBs — a real-chip compile failure
    ("kernel-vmem-stack-oom"), not a runtime OOM — hence the bm grid
    dimension; the shrink loops handle what remains. bm only halves while
    the result stays sublane-aligned (e.g. bf16 B=1008 must fall through
    to the bn/bk loops, not produce bm=504).
    """
    dtype = jnp.dtype(dtype)
    bk = min(block_k, K)
    bn = min(block_n, N)
    sub = 8 if dtype == jnp.float32 else 16
    bm_cap = max(sub, block_m // sub * sub)
    if B0 <= bm_cap:
        bm = _round_up(B0, sub)
    else:
        cands = sorted({c for c in (1024, 512, 256, 128, bm_cap)
                        if sub <= c <= bm_cap and c % sub == 0})
        bm = min(cands, key=lambda c: (-(-B0 // c), _round_up(B0, c)))

    def _vmem(bm, bk, bn):
        return (3 * bm * bn * 4                    # out block x2 + acc
                + 2 * bm * bk * dtype.itemsize     # x block x2
                + 2 * bk * bn                      # int8 w block x2
                + 2 * 4 * bn)                      # scale block x2
    while (bm > 128 and (bm // 2) % sub == 0
           and _vmem(bm, bk, bn) > 12 * 2**20):
        bm //= 2
    while bn > 128 and _vmem(bm, bk, bn) > 12 * 2**20:
        bn //= 2
    while bk > 128 and _vmem(bm, bk, bn) > 12 * 2**20:
        bk //= 2
    assert bm % sub == 0, (bm, sub)
    return bm, bk, bn


def _qmm_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k: int,
                cdtype):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # int8 -> compute dtype in VMEM (exact: int8 values are representable
    # in bf16); HBM only ever saw 1 byte/element
    w = w_ref[...].astype(cdtype)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _store():
        # per-output-channel scale folds into the f32 accumulator once
        o_ref[...] = acc_ref[...] * s_ref[...][0][None, :]


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_k", "block_n", "interpret"))
def quant_matmul(
    x: jax.Array,          # [B, K] compute dtype (bf16/f32)
    w_q: jax.Array,        # [K, N] int8
    scale: jax.Array,      # [N] f32 — per-output-channel dequant scale
    *,
    block_m: int = 1024,
    block_k: int = 512,
    block_n: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """``x @ (w_q * scale)`` with the dequant fused into the kernel.

    Returns [B, N] f32 (cast outside if the consumer wants bf16 — the
    epilogue add/activation usually does).
    """
    B0, K = x.shape
    K2, N = w_q.shape
    assert K == K2, (x.shape, w_q.shape)
    bm, bk, bn = select_blocks(B0, K, N, block_m, block_k, block_n, x.dtype)
    B = _round_up(B0, bm)
    assert B % bm == 0 and K % bk == 0 and N % bn == 0, (B, K, bm, bk, bn)
    n_k = K // bk
    grid = (B // bm, N // bn, n_k)

    xp = x if B == x.shape[0] else jnp.pad(x, ((0, B - x.shape[0]), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_qmm_kernel, n_k=n_k, cdtype=x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda m, n, k: (m, k)),
            pl.BlockSpec((bk, bn), lambda m, n, k: (k, n)),
            pl.BlockSpec((1, bn), lambda m, n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (m, n)),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(xp, w_q, scale[None, :].astype(jnp.float32))
    return out if B == x.shape[0] else out[: x.shape[0]]


def w8a8_matmul(x: jax.Array, w_q: jax.Array,
                scale: jax.Array) -> jax.Array:
    """``x @ (w_q * scale)`` with the ACTIVATIONS quantized too (W8A8).

    Per-row symmetric int8 quantization of ``x`` lets the MXU consume a
    native int8 x int8 -> int32 dot: no Pallas, no in-VMEM dequant
    convert (the VPU unpack chain that made the weight-only
    :func:`quant_matmul` a measured net loss at every 1.2B decode
    operating point — PERFORMANCE.md int8-weights table), the weight
    streams HBM at 1 byte/element, and XLA fuses the row/channel scale
    epilogue. Wider tolerance than weight-only int8: the activations
    round to 8 bits as well (decode-only path; reference workload
    /root/reference/src/evaluation/evaluate_rl.py:177-258).
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)      # [B, 1]
    xs = jnp.where(amax > 0, amax / 127.0, 1.0)
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * xs * scale[None, :]


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m
