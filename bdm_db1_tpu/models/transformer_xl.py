"""TransformerXL decoder for multi-modal multi-task (Gato-style) modeling.

TPU-first re-design of the reference model
(reference: src/model/transformer_xl.py:34-748). Key differences from the
CUDA/torch original, chosen for XLA/TPU:

* one trunk pass over a mixed-modality batch with **static shapes**: every
  modality group packs to the same sequence length and groups concatenate
  along batch (replacing ragged per-dataclass forwards,
  reference: src/model/transformer_xl.py:519-544);
* image-patch splicing at ``-1`` token slots is a masked gather
  (cumsum-index ``take_along_axis``) instead of boolean scatter
  (reference: src/model/transformer_xl.py:630-642);
* the segment-level memory is an explicit fixed-shape carry
  ``[n_layer, B, mem_len, D]`` (functionally an on-device cache) so the
  autoregressive eval step jits once per geometry
  (reference: src/model/transformer_xl.py:470-504);
* layers run under ``nn.scan`` (stacked params, fast compiles, PP-ready);
* attention scores/softmax/loss in fp32, bulk matmuls in bf16 on the MXU;
* weight matrices carry logical sharding axes ("vocab", "embed", "heads",
  "mlp") so pjit can lay them out over a ("data", "model") mesh — this
  implements the tensor parallelism the reference only stubs
  (reference: src/mpu/initialize.py:140-151).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from bdm_db1_tpu.core.config import ModelConfig, VisionConfig, VocabConfig
from bdm_db1_tpu.core.vocab import VocabLayout
from bdm_db1_tpu.data.input_specs import (
    ICTaskBatch,
    MODALITY_ORDER,
    NLPTaskBatch,
    RLTaskBatch,
    VQATaskBatch,
)
from bdm_db1_tpu.models.activations import ACT2FN
from bdm_db1_tpu.models.vision import VisionEmbedding
from bdm_db1_tpu.ops.attention import (
    causal_mask,
    rel_attention,
    same_length_mask,
)
from bdm_db1_tpu.ops.positional import relative_positional_embedding

Array = jnp.ndarray

NORMAL_INIT = nn.initializers.normal(stddev=0.02)


def _part(init, names):
    return nn.with_logical_partitioning(init, names)


class QDense(nn.Module):
    """``nn.Dense`` restricted to what the trunk uses, plus int8-kernel
    consumption for the decode-weight path: when the bound kernel arrives
    int8 (see :func:`quantize_decode_weights`), the sibling
    ``kernel_scale`` leaf dequantizes INSIDE the Pallas matmul
    (ops/quant_matmul.py) so HBM streams the weight at 1 byte/element —
    an XLA-level ``astype`` would materialize a full-precision copy, the
    same failure mode the int8 KV cache hit (PERFORMANCE.md). With a
    floating kernel the math is exactly ``nn.Dense``'s (promote to
    ``dtype``, dot, bias add) — training never sees the int8 branch."""

    features: int
    use_bias: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros_init()
    # int8 kernels only: also quantize activations per-row and use the
    # MXU-native int8 x int8 -> int32 dot (decode_weight_dtype="int8a8")
    # instead of the in-kernel-dequant Pallas matmul ("int8")
    a8: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kernel = self.param(
            "kernel", self.kernel_init,
            (jnp.shape(x)[-1], self.features), self.param_dtype)
        dtype = jnp.dtype(self.dtype)
        if jnp.dtype(kernel.dtype) == jnp.int8:
            from bdm_db1_tpu.ops.quant_matmul import (
                quant_matmul, w8a8_matmul,
            )

            scale = self.param("kernel_scale", nn.initializers.ones,
                               (self.features,), jnp.float32)
            shp = jnp.shape(x)
            if self.a8:
                y = w8a8_matmul(x.reshape(-1, shp[-1]), kernel, scale)
            else:
                y = quant_matmul(
                    x.reshape(-1, shp[-1]).astype(dtype), kernel, scale,
                    interpret=jax.devices()[0].platform != "tpu")
            y = y.reshape(shp[:-1] + (self.features,)).astype(dtype)
        else:
            y = jnp.dot(x.astype(dtype), kernel.astype(dtype))
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,),
                              self.param_dtype)
            y = y + bias.astype(dtype)
        return y


_QUANT_DENSE_PATHS = (
    ("layers", "attn", "qkv_net"),
    ("layers", "attn", "o_net"),
    ("layers", "ff", "wi"),
    ("layers", "ff", "wo"),
)


def decode_weights_quantized(params) -> bool:
    node = params
    for k in _QUANT_DENSE_PATHS[0]:
        node = node[k]
    return "kernel_scale" in node


def quantize_decode_weights(params):
    """Decode-only param transform: the trunk Dense kernels (qkv, o, ffn —
    ~2.0 of the 2.4 GB read per 1.2B forward) become int8 with per-layer,
    per-output-channel scales in sibling ``kernel_scale`` leaves, consumed
    by :class:`QDense`. Embedding/head (argmax parity), ``r_net`` (read
    raw by ``precompute_rk``), LayerNorms and biases keep their training
    dtypes. Tolerance path, like ``decode_cache_dtype="int8"``.
    """
    from bdm_db1_tpu.ops.quant_matmul import quantize_weight

    def _copy(d):
        return {k: _copy(v) if isinstance(v, dict) else v
                for k, v in d.items()}

    p = _copy(params)
    for path in _QUANT_DENSE_PATHS:
        node = p
        for k in path:
            node = node[k]
        boxed = node["kernel"]
        val = boxed.unbox() if hasattr(boxed, "unbox") else boxed
        wq, sc = jax.vmap(quantize_weight)(val.astype(jnp.float32))
        node["kernel"] = (boxed.replace_boxed(wq)
                          if hasattr(boxed, "replace_boxed") else wq)
        node["kernel_scale"] = sc          # [L, N] — nn.scan slices axis 0
    return p


def _xavier(gain: float):
    def init(key, shape, dtype):
        fan_in, fan_out = shape[0], shape[1]
        limit = gain * (6.0 / (fan_in + fan_out)) ** 0.5
        return jax.random.uniform(key, shape, dtype, -limit, limit)

    return init


def _qkv_init(cfg: ModelConfig):
    """DeepNorm qkv init: xavier(1) for q,k block, xavier(beta) for v block,
    fans per the torch slice semantics (reference:
    src/model/transformer_xl.py:444-454); plain normal(0.02) otherwise."""
    if not cfg.use_deepnorm:
        return NORMAL_INIT
    d = cfg.n_embed
    beta = (8 * cfg.n_layer) ** -0.25

    def init(key, shape, dtype):
        k1, k2 = jax.random.split(key)
        qk = _xavier(1.0)(k1, (d, 3 * d), dtype)[:, : 2 * d]
        v = _xavier(beta)(k2, (d, d), dtype)
        return jnp.concatenate([qk, v], axis=1)

    return init


def _dropout(cfg: ModelConfig, rate: float) -> nn.Module:
    """Dropout module per ``cfg.dropout_impl``: "u8" = byte-granular masks
    (ops/fast_dropout.py, 4x fewer PRNG bits — the measured train-step
    dropout cost is ~2.3%, PERFORMANCE.md); "flax" = nn.Dropout
    (float-granular, bit-matches the reference's torch dropout path,
    reference: src/model/transformer_xl.py Dropout sites)."""
    if getattr(cfg, "dropout_impl", "flax") == "u8":
        from bdm_db1_tpu.ops.fast_dropout import DropoutU8

        return DropoutU8(rate)
    return nn.Dropout(rate)


def _deepnorm_or_normal(cfg: ModelConfig):
    if not cfg.use_deepnorm:
        return NORMAL_INIT
    return _xavier((8 * cfg.n_layer) ** -0.25)


def narrow_dots_policy(max_width: int):
    """Remat policy: save batch-dim-free dot_general outputs whose free
    (non-contracted) width is <= ``max_width``. Wide projections — qkv
    [*, 3D] and the geglu intermediate [*, d_inner] — get recomputed in
    the backward pass instead of living in HBM across it."""

    def policy(prim, *avals, **params):
        if prim.name != "dot_general":
            return False
        (_, rc), (lb, rb) = params["dimension_numbers"]
        if lb or rb:
            return False
        rhs = avals[1]
        skip = set(rc) | set(rb)
        width = 1
        for i, dim in enumerate(rhs.shape):
            if i not in skip:
                width *= dim
        return width <= max_width

    return policy


def remat_policy_for(cfg: ModelConfig):
    """jax.checkpoint policy for cfg.remat_policy (None = save nothing).
    Every policy additionally saves the named Pallas attention outputs —
    a pallas_call is not a dot_general, so without the name match the
    backward pass re-runs the entire forward kernel per layer."""
    policy = None
    if cfg.remat_policy == "dots":
        policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    elif cfg.remat_policy == "dots_narrow":
        policy = narrow_dots_policy(cfg.n_embed)
    if policy is not None:
        policy = jax.checkpoint_policies.save_from_both_policies(
            policy,
            jax.checkpoint_policies.save_only_these_names(
                "pallas_attn_out", "pallas_attn_m", "pallas_attn_l"))
    return policy


def quantize_kv_rows(x: Array) -> Tuple[Array, Array]:
    """Symmetric per-(…, head) int8 quantization over the trailing Dh axis.
    Returns (int8 values, float32 scales with the Dh axis dropped)."""
    xf = jax.lax.stop_gradient(x).astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale[..., 0]


def dequantize_kv(q: Array, scale: Array, dtype) -> Array:
    """Inverse of :func:`quantize_kv_rows` (broadcast scales over Dh)."""
    return (q.astype(jnp.float32)
            * scale.astype(jnp.float32)[..., None]).astype(dtype)


def _use_pallas(cfg: ModelConfig, qlen: int, klen: int,
                use_dropatt: bool) -> bool:
    if cfg.attention_impl == "xla" or use_dropatt:
        return False
    from bdm_db1_tpu.ops.pallas_attention import (
        pallas_anylen_applicable, pallas_applicable,
    )

    if not (pallas_applicable(qlen, klen)
            or pallas_anylen_applicable(qlen, klen)):
        return False
    if cfg.attention_impl == "pallas":
        return True
    return jax.devices()[0].platform == "tpu"  # "auto"


class RelMultiHeadAttn(nn.Module):
    """Relative multi-head attention with fused QKV over [mem || x]
    (reference: src/model/transformer_xl.py:53-243).

    ``mem`` is either hidden states [B, M, D] (reference semantics: K/V are
    recomputed from the cached hiddens every forward) or a ``(k, v)`` tuple
    of already-projected caches [B, M, H, Dh] — mathematically identical
    because the QKV projection is per-position, but ~an order of magnitude
    cheaper per decode step at mem_len 1024. Returns ``(out, aux)`` where
    aux is the (k_x, v_x) cache contribution of the new tokens in cache
    mode, else None.
    """

    cfg: ModelConfig
    # sharded decode (eval/decode.py ActionDecoder(mesh=...)): the q == 1
    # flash kernel runs under a shard_map over ("data", "model") — see
    # flash_ring_decode(mesh=...). None = single-chip pjit semantics.
    decode_mesh: Any = None

    @nn.compact
    def __call__(
        self,
        x: Array,                # [B, q, D]
        r: Array,                # [k, D] positional embeddings
        mem,                     # [B, M, D] hiddens OR (k, v) caches
        mask: Array,             # [q, k] bool
        r_w_bias: Optional[Array],
        r_r_bias: Optional[Array],
        deterministic: bool,
        flash_kv=None,           # (k2, v2) [L, B, M, H, Dh] stacked caches,
                                 # +(k_scale, v_scale) when int8
    ):
        cfg = self.cfg
        d, h, dh = cfg.n_embed, cfg.n_head, cfg.d_head
        dtype = jnp.dtype(cfg.dtype)
        kv_mode = isinstance(mem, tuple)

        if cfg.untie_r:
            r_w_bias = self.param(
                "r_w_bias", _part(NORMAL_INIT, ("heads", "head_dim")), (h, dh),
                cfg.param_dtype,
            )
            r_r_bias = self.param(
                "r_r_bias", _part(NORMAL_INIT, ("heads", "head_dim")), (h, dh),
                cfg.param_dtype,
            )

        ln = nn.LayerNorm(
            epsilon=cfg.layer_norm_epsilon, dtype=dtype,
            param_dtype=cfg.param_dtype, name="layer_norm",
        )
        qkv_net = QDense(
            3 * d, use_bias=False, dtype=dtype, param_dtype=cfg.param_dtype,
            kernel_init=_part(_qkv_init(cfg), ("embed", "qkv")),
            a8=cfg.decode_weight_dtype == "int8a8", name="qkv_net",
        )

        qlen = x.shape[1]
        b = x.shape[0]
        aux = None
        rk_pre = None
        if flash_kv is not None:
            # ---- fused single-token ring decode (Pallas) -----------------
            # mem = (rk_full [M+1, H, Dh], cursor, layer_idx); the FULL
            # stacked caches ride in ``flash_kv`` as broadcast scan args so
            # the kernel DMAs the layer's blocks straight out of the
            # stacked buffer (scalar-prefetched layer index) — no XLA
            # staging slice. Math == the XLA ring branch below at q == 1
            # (rel_shift is identity, the BD rotation/mask fold into an
            # additive bias, the self column merges in an online-softmax
            # epilogue) — parity: tests/test_flash_decode.py.
            from bdm_db1_tpu.ops.attention import rel_shift_sliced
            from bdm_db1_tpu.ops.flash_ring_decode import (
                NEG_INF, combine_new_columns, combine_self_column,
                flash_ring_decode, flash_ring_prime, flash_ring_prime_ap,
            )

            # 2-tuple: exact-dtype caches; 4-tuple: int8 caches + dequant
            # scales (stored [L, B, M, H] layout for every qlen)
            if len(flash_kv) == 4:
                k2, v2, k_sc, v_sc = flash_kv
            else:
                (k2, v2), k_sc, v_sc = flash_kv, None, None
            rk_full, cursor, lidx = mem
            M = k2.shape[2]
            interpret = jax.devices()[0].platform != "tpu"
            pre = ln(x.astype(dtype)) if cfg.pre_lnorm else x.astype(dtype)
            q, k_x, v_x = jnp.split(qkv_net(pre), 3, axis=-1)
            q = q.reshape(b, qlen, h, dh)
            k_x = k_x.reshape(b, qlen, h, dh)
            v_x = v_x.reshape(b, qlen, h, dh)

            qf = q.astype(jnp.float32)
            qw = qf + r_w_bias.astype(jnp.float32)        # [B, Q, H, Dh]
            qr = qf + r_r_bias.astype(jnp.float32)
            scale = 1.0 / (dh ** 0.5)
            if qlen == 1:
                qw0, qr0 = qw[:, 0], qr[:, 0]             # [B, H, Dh]
                bd = jnp.einsum("bhd,jhd->bhj", qr0,
                                rk_full.astype(jnp.float32))   # [B,H,M+1]
                # aligned col c lives at ring slot (cursor + c) % M
                bd_s = jnp.roll(bd[..., :M], cursor, axis=-1)
                mask_s = jnp.roll(mask[0, :M], cursor)
                bias = jnp.where(mask_s[None, None], NEG_INF, bd_s * scale)
                o_un, m_s, l_s = flash_ring_decode(
                    k2, v2, qw0.astype(dtype), bias, lidx, k_sc, v_sc,
                    n_head=h, d_head=dh, scale=scale, interpret=interpret,
                    mesh=self.decode_mesh)
                # distance-0 self column (never masked at q == 1)
                s_x = ((qw0 * k_x[:, 0].astype(jnp.float32)).sum(-1)
                       + bd[..., M]) * scale
                attn = combine_self_column(
                    o_un, m_s, l_s, s_x, v_x[:, 0], h, dh)[:, None]
            else:
                bd = jnp.einsum("bihd,jhd->bhij", qr,
                                rk_full.astype(jnp.float32))  # [B,H,Q,M+Q]
                bd = rel_shift_sliced(bd)
                bd_s = jnp.roll(bd[..., :M], cursor, axis=-1)
                mask_s = jnp.roll(mask[:, :M], cursor, axis=-1)  # [Q, M]
                bias = jnp.where(mask_s[None, None], NEG_INF, bd_s * scale)
                # all-pairs kernel for both cache dtypes (one wide MXU
                # dot; the per-head loop's strided VMEM slices cost ~3x
                # the HBM floor per layer-call — flash_ring_prime stays
                # as its parity oracle/fallback)
                o_un, m_s, l_s = flash_ring_prime_ap(
                    k2, v2, qw.transpose(0, 2, 1, 3).astype(dtype), bias,
                    lidx, k_sc, v_sc, n_head=h, d_head=dh, scale=scale,
                    interpret=interpret, mesh=self.decode_mesh,
                    compact=cfg.decode_prime_compact)
                # new tokens' q x q block (causal among themselves)
                ac_x = jnp.einsum("bihd,bjhd->bhij", qw,
                                  k_x.astype(jnp.float32))
                s_new = jnp.where(mask[None, None, :, M:], NEG_INF,
                                  (ac_x + bd[..., M:]) * scale)
                attn = combine_new_columns(
                    o_un, m_s, l_s, s_new, v_x, compute_dtype=dtype)
            out = QDense(
                d, use_bias=False, dtype=dtype, param_dtype=cfg.param_dtype,
                kernel_init=_part(_deepnorm_or_normal(cfg),
                                  ("heads", "embed")),
                a8=cfg.decode_weight_dtype == "int8a8", name="o_net",
            )(attn.astype(dtype).reshape(b, qlen, d))
            out = _dropout(cfg, cfg.drop)(out, deterministic=deterministic)
            alpha = (2 * cfg.n_layer) ** 0.25 if cfg.use_deepnorm else 1.0
            res = (x + out) if cfg.pre_lnorm else ln(x * alpha + out)
            return res, (k_x, v_x)
        if kv_mode and len(mem) in (4, 6):
            # ---- ring-buffer cache, any qlen <= mem_len ------------------
            # mem = (k_cache, v_cache, rk_full, cursor): the cache is a ring
            # (slot j holds the key of age rank (j - cursor) mod M, oldest
            # first). BD scores are computed in ALIGNED column order via the
            # standard rel-shift over the full positional table, then the
            # cache part is column-rotated by ``cursor`` into ring order —
            # rolling [B, H, q, M] fp32 scores is far cheaper than rolling
            # the [M, H, Dh] projections or the whole K/V cache. The caller
            # scatters (k_x, v_x) at the cursor afterwards — the cache is
            # never copied. ``mask`` arrives in aligned order [q, M+q]; its
            # cache columns get the same rotation.
            # A 6-tuple carries an int8 cache + per-(position, head) scales
            # (decode_cache_dtype="int8"): dequantization fuses into the
            # score/PV contractions, so HBM reads the cache at 1 byte/elem.
            if len(mem) == 6:
                k_cache, v_cache, k_scale, v_scale, rk_full, cursor = mem
            else:
                k_cache, v_cache, rk_full, cursor = mem
                k_scale = v_scale = None
            # cache slices arrive [B, M, H, Dh]. (A [B, H, M, Dh] reorder
            # was tried to pre-match the dot operand layout and measured
            # SLOWER end to end — 75 vs 100 actions/s at 1.2B b24: XLA's
            # preferred while-carry layout follows the scatter, not the
            # dot, so the reorder only moved the relayout copies around.
            # The actual fix is the q==1 dynamic_update_slice fast path in
            # decode_rl_kv_ring.)
            M = k_cache.shape[1]
            pre = ln(x.astype(dtype)) if cfg.pre_lnorm else x.astype(dtype)
            q, k_x, v_x = jnp.split(qkv_net(pre), 3, axis=-1)
            q = q.reshape(b, qlen, h, dh)
            k_x = k_x.reshape(b, qlen, h, dh)
            v_x = v_x.reshape(b, qlen, h, dh)

            qf = q.astype(jnp.float32)
            qw = qf + r_w_bias.astype(jnp.float32)
            qr = qf + r_r_bias.astype(jnp.float32)
            # int8 cache: the operand stays a bare int8->f32 convert (fuses
            # into the dot's operand read) and the per-(position, head)
            # scale lands on the [B,H,q,M] scores — scaling the cache
            # operand itself makes XLA materialize a full-precision cache
            # copy per layer (measured slower than the bf16 cache).
            ac_s = jnp.einsum("bihd,bjhd->bhij", qw,
                              k_cache.astype(jnp.float32))  # ring order
            if k_scale is not None:  # [B, M, H] -> broadcast over queries
                ac_s = ac_s * k_scale.astype(
                    jnp.float32).transpose(0, 2, 1)[:, :, None, :]
            ac_x = jnp.einsum("bihd,bjhd->bhij", qw,
                              k_x.astype(jnp.float32))      # new tokens
            from bdm_db1_tpu.ops.attention import rel_shift, rel_shift_sliced

            bd = jnp.einsum("bihd,jhd->bhij", qr,
                            rk_full.astype(jnp.float32))    # [B,H,q,M+q]
            # small-q primes (the per-env-step hot path) use the slice
            # form: the pad/reshape trick's transposes cost ~31 ms/step at
            # 1.2B b24; differences live only in always-masked columns
            bd = rel_shift_sliced(bd) if qlen <= 64 else rel_shift(bd)
            # aligned col c (0 = oldest) lives at ring slot (cursor + c) % M
            bd_s = jnp.roll(bd[..., :M], cursor, axis=-1)
            bd_x = bd[..., M:]
            scale = 1.0 / (dh ** 0.5)
            scores = jnp.concatenate(
                [ac_s + bd_s, ac_x + bd_x], axis=-1) * scale
            mask_ring = jnp.concatenate(
                [jnp.roll(mask[:, :M], cursor, axis=-1), mask[:, M:]],
                axis=-1)
            scores = jnp.where(mask_ring[None, None], -1e30, scores)
            probs_f = jax.nn.softmax(scores, axis=-1)
            if v_scale is not None:
                # fold the V dequant scale into the probabilities (f32,
                # before the cast) so the PV operand stays a bare convert
                sc = v_scale.astype(jnp.float32).transpose(0, 2, 1)
                probs_f = jnp.concatenate(
                    [probs_f[..., :M] * sc[:, :, None, :], probs_f[..., M:]],
                    axis=-1)
            probs = probs_f.astype(dtype)
            v_all = jnp.concatenate([v_cache.astype(dtype), v_x], axis=1)
            attn = jnp.einsum("bhij,bjhd->bihd", probs, v_all)
            out = QDense(
                d, use_bias=False, dtype=dtype, param_dtype=cfg.param_dtype,
                kernel_init=_part(_deepnorm_or_normal(cfg),
                                  ("heads", "embed")),
                a8=cfg.decode_weight_dtype == "int8a8", name="o_net",
            )(attn.reshape(b, qlen, d))
            out = _dropout(cfg, cfg.drop)(out, deterministic=deterministic)
            alpha = (2 * cfg.n_layer) ** 0.25 if cfg.use_deepnorm else 1.0
            res = (x + out) if cfg.pre_lnorm else ln(x * alpha + out)
            return res, (k_x, v_x)
        if kv_mode:
            # project only the new tokens; splice cached K/V in front.
            # An optional third element carries this layer's precomputed
            # positional projection (r_net is input-independent — decode
            # hot path skips 24 [klen,D]x[D,D] matmuls per forward).
            if len(mem) == 3:
                k_cache, v_cache, rk_pre = mem
            else:
                k_cache, v_cache = mem
            pre = ln(x.astype(dtype)) if cfg.pre_lnorm else x.astype(dtype)
            q, k_x, v_x = jnp.split(qkv_net(pre), 3, axis=-1)
            q = q.reshape(b, qlen, h, dh)
            k_x = k_x.reshape(b, qlen, h, dh)
            v_x = v_x.reshape(b, qlen, h, dh)
            k = jnp.concatenate([k_cache.astype(dtype), k_x], axis=1)
            v = jnp.concatenate([v_cache.astype(dtype), v_x], axis=1)
            klen = k.shape[1]
            aux = (k_x, v_x)
        else:
            cat = jnp.concatenate([mem.astype(dtype), x.astype(dtype)], axis=1)
            pre = ln(cat) if cfg.pre_lnorm else cat
            q, k, v = jnp.split(qkv_net(pre), 3, axis=-1)
            klen = cat.shape[1]
            q = q[:, -qlen:].reshape(b, qlen, h, dh)
            k = k.reshape(b, klen, h, dh)
            v = v.reshape(b, klen, h, dh)

        if rk_pre is not None:
            r_k = rk_pre.astype(dtype)
        else:
            r_k = nn.Dense(
                d, use_bias=False, dtype=dtype, param_dtype=cfg.param_dtype,
                kernel_init=_part(NORMAL_INIT, ("embed", "qkv")),
                name="r_net",
            )(r.astype(dtype)).reshape(klen, h, dh)

        drop_rng = None
        use_dropatt = not deterministic and cfg.dropattn > 0.0
        if use_dropatt:
            drop_rng = self.make_rng("dropout")

        if _use_pallas(cfg, qlen, klen, use_dropatt):
            from bdm_db1_tpu.ops.pallas_attention import (
                pallas_rel_attention_anylen,
            )

            attn = pallas_rel_attention_anylen(
                q, k, v, r_k, r_w_bias.astype(jnp.float32),
                r_r_bias.astype(jnp.float32), cfg.mem_len,
                cfg.same_length, 1.0 / (dh ** 0.5),
            ).astype(dtype)
        else:
            attn = rel_attention(
                q, k, v, r_k, r_w_bias, r_r_bias, mask,
                dropout_rate=cfg.dropattn if not deterministic else 0.0,
                dropout_rng=drop_rng, compute_dtype=dtype,
            )
        out = QDense(
            d, use_bias=False, dtype=dtype, param_dtype=cfg.param_dtype,
            kernel_init=_part(_deepnorm_or_normal(cfg), ("heads", "embed")),
            a8=cfg.decode_weight_dtype == "int8a8", name="o_net",
        )(attn.reshape(b, qlen, d))
        out = _dropout(cfg, cfg.drop)(out, deterministic=deterministic)

        alpha = (2 * cfg.n_layer) ** 0.25 if cfg.use_deepnorm else 1.0
        if cfg.pre_lnorm:
            return x + out, aux
        return ln(x * alpha + out), aux  # post-LN residual


class PositionwiseFF(nn.Module):
    """FFN with optional GEGLU (reference: src/model/transformer_xl.py:246-292).

    GEGLU is stored as two half-width kernels (value + gate) — equivalent to
    the reference's single wide matrix split in two, but independently
    shardable along the "mlp" axis for TP.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: Array, deterministic: bool) -> Array:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        act = ACT2FN[cfg.activation_fn]
        d_inner = cfg.d_inner

        ln = nn.LayerNorm(
            epsilon=cfg.layer_norm_epsilon, dtype=dtype,
            param_dtype=cfg.param_dtype, name="layer_norm",
        )
        inp = ln(x) if cfg.pre_lnorm else x

        dense_in = QDense(
            d_inner, use_bias=True, dtype=dtype, param_dtype=cfg.param_dtype,
            kernel_init=_part(_deepnorm_or_normal(cfg), ("embed", "mlp")),
            bias_init=_part(nn.initializers.zeros_init(), ("mlp",)),
            a8=cfg.decode_weight_dtype == "int8a8", name="wi",
        )
        h = act(dense_in(inp))
        h = QDense(
            cfg.n_embed, use_bias=True, dtype=dtype,
            param_dtype=cfg.param_dtype,
            kernel_init=_part(_deepnorm_or_normal(cfg), ("mlp", "embed")),
            bias_init=_part(nn.initializers.zeros_init(), ("embed",)),
            a8=cfg.decode_weight_dtype == "int8a8", name="wo",
        )(h)
        h = _dropout(cfg, cfg.drop)(h, deterministic=deterministic)

        alpha = (2 * cfg.n_layer) ** 0.25 if cfg.use_deepnorm else 1.0
        if cfg.pre_lnorm:
            return h + x
        return ln(x * alpha + h)


class DecoderLayer(nn.Module):
    """Attention + FFN (reference: src/model/transformer_xl.py:295-353)."""

    cfg: ModelConfig
    decode_mesh: Any = None

    @nn.compact
    def __call__(self, h, mem, r, mask, r_w_bias, r_r_bias, deterministic,
                 flash_kv=None):
        hid_in = h
        if self.cfg.sequence_sharded_activations:
            # Megatron-SP: between blocks, activations shard along sequence
            # over the model axis; XLA all-gathers around attention/FFN
            h = nn.with_logical_constraint(
                h, ("batch", "length_sharded", "embed"))
        h, aux = RelMultiHeadAttn(self.cfg, self.decode_mesh, name="attn")(
            h, r, mem, mask, r_w_bias, r_r_bias, deterministic,
            flash_kv=flash_kv,
        )
        h = PositionwiseFF(self.cfg, name="ff")(h, deterministic)
        if self.cfg.sequence_sharded_activations:
            h = nn.with_logical_constraint(
                h, ("batch", "length_sharded", "embed"))
        # scan ys: cache contributions (kv mode) or the layer input (hidden
        # mode, feeding the reference-style memory update)
        return h, (aux if aux is not None else hid_in)


class TransformerXL(nn.Module):
    cfg: ModelConfig
    vocab: VocabConfig
    vision: VisionConfig
    # sharded decode: set via model.clone(decode_mesh=mesh) (eval/decode.py
    # ActionDecoder) so the q == 1 flash ring kernel shard_maps over the
    # mesh instead of forcing its operands replicated under pjit. Runtime
    # plumbing only — never serialized, no effect on params.
    decode_mesh: Any = None

    @property
    def layout(self) -> VocabLayout:
        return self.vocab.layout()

    def setup(self):
        cfg = self.cfg
        layout = self.vocab.layout()
        self.word_embedding = nn.Embed(
            layout.padded_vocab_size, cfg.n_embed,
            dtype=jnp.dtype(cfg.dtype), param_dtype=cfg.param_dtype,
            embedding_init=_part(NORMAL_INIT, ("vocab", "embed")),
            name="word_embedding",
        )
        self.rl_timestep_embedding = nn.Embed(
            cfg.rl_timestep_vocab_size, cfg.n_embed,
            dtype=jnp.dtype(cfg.dtype), param_dtype=cfg.param_dtype,
            embedding_init=_part(NORMAL_INIT, (None, "embed")),
            name="rl_timestep_embedding",
        )
        self.vision_encoder = VisionEmbedding(cfg, self.vision, name="vision")
        if not cfg.untie_r:
            self.r_w_bias = self.param(
                "r_w_bias", _part(NORMAL_INIT, ("heads", "head_dim")),
                (cfg.n_head, cfg.d_head), cfg.param_dtype,
            )
            self.r_r_bias = self.param(
                "r_r_bias", _part(NORMAL_INIT, ("heads", "head_dim")),
                (cfg.n_head, cfg.d_head), cfg.param_dtype,
            )
        layer_cls = DecoderLayer
        if cfg.remat:
            # recompute each layer in backward: activation memory drops from
            # O(n_layer * B * L * D) to O(B * L * D). "dots" saves matmul
            # outputs (recompute elementwise only); "dots_narrow" also
            # recomputes the wide intermediates (qkv 3D, geglu d_inner) —
            # at 1.2B/micro-8 that frees 5.6 GB of saved activations for
            # +2 matmul recomputes/layer, letting a bigger micro batch fit
            # one v5e chip's HBM
            layer_cls = nn.remat(
                DecoderLayer, static_argnums=(7,),
                prevent_cse=False, policy=remat_policy_for(cfg),
            )
        ScanLayers = nn.scan(
            layer_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast,
                     nn.broadcast, nn.broadcast),
            out_axes=0,
            length=cfg.n_layer,
            metadata_params={nn.meta.PARTITION_NAME: "layers"},
        )
        self.layers = ScanLayers(cfg, self.decode_mesh, name="layers")
        if not cfg.share_input_output_embedding:
            self.lm_head = nn.Dense(
                self.vocab.layout().padded_vocab_size, use_bias=False,
                dtype=jnp.dtype(cfg.dtype), param_dtype=cfg.param_dtype,
                kernel_init=_part(NORMAL_INIT, ("embed", "vocab")),
                name="lm_head",
            )
        self.embed_dropout = _dropout(cfg, cfg.embd_pdrop)

    # ---- memory ----------------------------------------------------------
    def init_mems(self, batch_size: int) -> Array:
        """Zero segment memory [n_layer, B, mem_len, D]
        (reference: src/model/transformer_xl.py:470-485)."""
        cfg = self.cfg
        return jnp.zeros(
            (cfg.n_layer, batch_size, cfg.mem_len, cfg.n_embed),
            dtype=jnp.dtype(cfg.dtype),
        )

    # ---- per-modality embedders -------------------------------------------
    def embed_rl(self, batch: RLTaskBatch, deterministic: bool = True) -> Array:
        """Word-embed ids >= 0, splice patch embeddings at -1 slots, add the
        local-timestep embedding (reference: src/model/transformer_xl.py:621-660)."""
        ids = batch.tokens
        b, l = ids.shape
        img_slot = ids < 0
        emb = self.word_embedding(jnp.maximum(ids, 0))
        emb = jnp.where(img_slot[..., None], 0.0, emb)
        if batch.images is not None:
            imgs = batch.images
            bt = imgs.shape[0] * imgs.shape[1]
            vis = self.vision_encoder(
                imgs.reshape((bt,) + imgs.shape[2:]), deterministic=deterministic
            )
            vis = vis.reshape(b, -1, self.cfg.n_embed)
            # j-th image slot in a row takes the j-th patch embedding
            slot_idx = jnp.clip(jnp.cumsum(img_slot, axis=1) - 1, 0, vis.shape[1] - 1)
            gathered = jnp.take_along_axis(vis, slot_idx[..., None], axis=1)
            emb = jnp.where(img_slot[..., None], gathered, emb)
        emb = emb + self.rl_timestep_embedding(batch.position_id)
        return emb

    def embed_nlp(self, batch: NLPTaskBatch, deterministic: bool = True) -> Array:
        return self.word_embedding(batch.tokens)

    def embed_ic(self, batch: ICTaskBatch, deterministic: bool = True) -> Array:
        vis = self.vision_encoder(batch.images, deterministic=deterministic)
        return jnp.concatenate(
            [self.word_embedding(batch.prompt), vis,
             self.word_embedding(batch.text)], axis=1,
        )

    def embed_vqa(self, batch: VQATaskBatch, deterministic: bool = True) -> Array:
        vis = self.vision_encoder(batch.images, deterministic=deterministic)
        return jnp.concatenate(
            [self.word_embedding(batch.prompt), vis,
             self.word_embedding(batch.text)], axis=1,
        )

    # ---- trunk --------------------------------------------------------------
    def trunk(
        self, h: Array, mems: Optional[Array], deterministic: bool
    ) -> Tuple[Array, Optional[Array]]:
        cfg = self.cfg
        b, qlen, _ = h.shape
        if mems is None:
            mems_in = jnp.zeros(
                (cfg.n_layer, b, 0, cfg.n_embed), dtype=jnp.dtype(cfg.dtype)
            )
        else:
            mems_in = mems.astype(jnp.dtype(cfg.dtype))
        mlen = mems_in.shape[2]
        klen = mlen + qlen

        if cfg.same_length:
            mask = same_length_mask(qlen, klen, cfg.mem_len)
        else:
            mask = causal_mask(qlen, klen)

        r = relative_positional_embedding(
            klen, cfg.n_embed, cfg.effective_clamp_len
        )
        h = self.embed_dropout(h, deterministic=deterministic)
        r = self.embed_dropout(r, deterministic=deterministic)

        r_w = getattr(self, "r_w_bias", None)
        r_r = getattr(self, "r_r_bias", None)
        h, hids = self.layers(h, mems_in, r, mask, r_w, r_r, deterministic,
                              None)

        new_mems = None
        if mems is not None:
            # slide the window: keep the trailing mem_len of [mem || hids]
            # (reference: src/model/transformer_xl.py:487-504)
            cat = jnp.concatenate([mems_in, hids], axis=2)
            new_mems = jax.lax.stop_gradient(cat[:, :, -cfg.mem_len:, :])
        return h, new_mems

    def trunk_kv(
        self, h: Array, cache: Dict[str, Array], deterministic: bool = True,
        rk: Optional[Array] = None,
    ) -> Tuple[Array, Dict[str, Array]]:
        """KV-cache trunk: identical math to ``trunk`` for post-LN models
        (K/V are per-position projections of the cached hiddens), ~10x
        cheaper per decode step. cache: {"k","v"}: [n_layer, B, M, H, Dh]."""
        cfg = self.cfg
        b, qlen, _ = h.shape
        mlen = cache["k"].shape[2]
        klen = mlen + qlen

        if cfg.same_length:
            mask = same_length_mask(qlen, klen, cfg.mem_len)
        else:
            mask = causal_mask(qlen, klen)
        r = relative_positional_embedding(
            klen, cfg.n_embed, cfg.effective_clamp_len)

        r_w = getattr(self, "r_w_bias", None)
        r_r = getattr(self, "r_r_bias", None)
        if rk is not None:
            assert rk.shape[1] == klen, (rk.shape, klen)
            mem_xs = (cache["k"], cache["v"], rk)
        else:
            mem_xs = (cache["k"], cache["v"])
        h, (k_x, v_x) = self.layers(
            h, mem_xs, r, mask, r_w, r_r, deterministic, None)
        new_cache = {
            "k": jax.lax.stop_gradient(
                jnp.concatenate([cache["k"], k_x], axis=2)[:, :, -cfg.mem_len:]),
            "v": jax.lax.stop_gradient(
                jnp.concatenate([cache["v"], v_x], axis=2)[:, :, -cfg.mem_len:]),
        }
        return h, new_cache

    def init_kv_cache(self, batch_size: int) -> Dict[str, Array]:
        """Zero K/V cache — exactly equivalent to the reference's zero hidden
        memory for post-LN models (QKV has no bias, so K/V of zero hiddens
        are zero). Pre-LN models must use ``init_mems``/``decode_rl``
        (LN(0) = LN bias != 0 there)."""
        cfg = self.cfg
        assert not cfg.pre_lnorm, (
            "zero KV cache is only reference-equivalent for post-LN; "
            "use init_mems/decode_rl for pre-LN models")
        shape = (cfg.n_layer, batch_size, cfg.mem_len, cfg.n_head, cfg.d_head)
        # two distinct buffers: callers donate the cache into the jitted
        # decode step, and XLA rejects donating one buffer twice
        return {"k": jnp.zeros(shape, dtype=jnp.dtype(cfg.dtype)),
                "v": jnp.zeros(shape, dtype=jnp.dtype(cfg.dtype))}

    def init_kv_cache_ring(self, batch_size: int) -> Dict[str, Array]:
        """Zero ring K/V cache for :meth:`decode_rl_kv_ring` — same
        [n_layer, B, mem_len, H, Dh] layout as the aligned cache, plus the
        ring cursor. With decode_cache_dtype="int8" the values are int8
        with per-(position, head) f32 scales (zero values x zero scales
        still dequantize to the reference-equivalent zero cache)."""
        cfg = self.cfg
        assert not cfg.pre_lnorm, (
            "zero KV cache is only reference-equivalent for post-LN; "
            "use init_mems/decode_rl for pre-LN models")
        shape = (cfg.n_layer, batch_size, cfg.mem_len, cfg.n_head, cfg.d_head)
        cursor = jnp.zeros((), jnp.int32)
        if cfg.decode_cache_dtype == "int8":
            sshape = shape[:-1]
            return {"k": jnp.zeros(shape, jnp.int8),
                    "v": jnp.zeros(shape, jnp.int8),
                    "k_scale": jnp.zeros(sshape, jnp.float32),
                    "v_scale": jnp.zeros(sshape, jnp.float32),
                    "cursor": cursor}
        return {"k": jnp.zeros(shape, dtype=jnp.dtype(cfg.dtype)),
                "v": jnp.zeros(shape, dtype=jnp.dtype(cfg.dtype)),
                "cursor": cursor}

    def decode_rl_kv(
        self,
        tokens: Array,          # [B, q]
        position_id: Array,     # [B, q]
        cache: Dict[str, Array],
        images: Optional[Array] = None,
        rk: Optional[Array] = None,   # [n_layer, klen, H, Dh] precomputed
    ) -> Tuple[Array, Dict[str, Array]]:
        """Fast autoregressive eval step over the K/V cache."""
        sub = RLTaskBatch(tokens=tokens, position_id=position_id, images=images)
        h = self.embed_rl(sub)
        h, new_cache = self.trunk_kv(h, cache, deterministic=True, rk=rk)
        logits = self.logits(h[:, -1:, :])[:, 0, :]
        return logits, new_cache

    def decode_rl_kv_ring(
        self,
        tokens: Array,          # [B, q], q <= mem_len
        position_id: Array,     # [B, q]
        cache: Dict[str, Array],  # {"k","v": [L,B,M,H,Dh], "cursor": int32}
                                  # (+"k_scale"/"v_scale" [L,B,M,H] if int8)
        rk_full: Array,         # [L, M+q, H, Dh] precomputed projections
        images: Optional[Array] = None,
        spec_tail: int = 0,
        real_q: Optional[Array] = None,
    ) -> Tuple[Array, Dict[str, Array]]:
        """Autoregressive decode over a ring-buffer cache, any qlen up to
        mem_len — used for BOTH the multi-token prime and the per-action
        single-token steps. New K/V scatter in place at ``cursor`` instead
        of shifting the whole window: the aligned prime path costs ~8
        full-cache HBM passes per env step at 1.2B (ring->aligned rolls +
        concat + window slice); this writes q rows. Slot j holds the key of
        age rank (j - cursor) mod M, so the BD positional scores and the
        attention mask are the aligned ones column-rotated by ``cursor``
        (done inside the layer) — identical math, enforced against the
        aligned path by tests/test_kv_cache.py. The cache-column attention
        runs in the fused Pallas ring-decode kernels when the shapes admit
        them (``_use_flash_decode``; ops/flash_ring_decode.py — the stacked
        cache streams HBM once per forward); otherwise the XLA einsum ring
        branch below is the fallback (and the parity oracle for the
        kernels, tests/test_flash_decode.py).

        ``spec_tail`` (static) marks the trailing ``spec_tail`` tokens as
        query-only *speculative guesses* (eval/decode.py Jacobi decode):
        they attend normally (under same_length every query sees exactly
        mem_len keys, so their logits are the ones a sequential decode
        would produce once their input prefix is confirmed — the chunked-
        priming argument) but their K/V rows are NOT committed and the
        cursor advances only past the q - spec_tail real tokens. Returns
        logits at every position from the last committed token on
        ([B, spec_tail+1, V]; [B, q, V] when nothing commits) instead of
        the last position only.

        ``real_q`` (a DYNAMIC int32 scalar) switches the call into
        geometry-bucket mode (eval/decode.py obs-geometry coarsening,
        SURVEY.md §7 hard part 5): only the first ``real_q`` rows are
        real committed tokens — everything after is query-only (their
        K/V rows never commit and the cursor advances by ``real_q``) —
        and because the count is a traced operand, envs with different
        obs lengths share ONE compiled program per bucket width. Logits
        come from ``spec_tail + 1`` rows starting at ``real_q - 1`` (the
        real prime's last token, plus the speculative guesses when the
        caller composes bucketing with Jacobi decode — its in-call
        layout is [real || guesses || pads], so guess rows directly
        follow the real prefix and pads are last). Exact vs the unpadded
        call: every real/guess query's key set is unchanged (pads sit
        after them; attention masks and BD positional scores are
        row-index arithmetic, agnostic to where the real/pad boundary
        falls), and the masked commit writes real rows only
        (tests/test_geometry_buckets.py)."""
        cfg = self.cfg
        M = cfg.mem_len
        qlen = tokens.shape[1]
        assert qlen <= M, (qlen, M)
        cursor = cache["cursor"]

        sub = RLTaskBatch(tokens=tokens, position_id=position_id,
                          images=images)
        h = self.embed_rl(sub)

        if cfg.same_length:
            mask = same_length_mask(qlen, M + qlen, M)
        else:
            mask = causal_mask(qlen, M + qlen)
        r_w = getattr(self, "r_w_bias", None)
        r_r = getattr(self, "r_r_bias", None)
        cursor_per_layer = jnp.broadcast_to(cursor, (cfg.n_layer,))
        quantized = "k_scale" in cache
        use_flash = self._use_flash_decode(qlen)
        if (use_flash and spec_tail and tokens.shape[0] < 32
                and cfg.decode_flash != "on"
                and jax.devices()[0].platform == "tpu"):
            # chip-validated fault map (r5): the speculative-tail flash
            # program crashes the TPU worker at batch < 32 (b16/b24
            # reproduce, b32/b40 clean; the SAME batch is fine on the
            # XLA ring branch, and classic flash primes of the same
            # qlen are fine) — route spec-tail calls at those batches
            # to the XLA branch. The q == 1 cache-fold steps keep the
            # fused kernel. Probe script: /tmp-style repro retained as
            # scripts/chipcheck.py coverage.
            use_flash = False
        flash_kv = None
        if use_flash:
            # native [L, B, M, H, Dh] layout straight into the kernel — a
            # head-dim-merging reshape here is a TPU relayout, not a
            # bitcast: XLA materializes a full 3.75 GB cache copy per array.
            # int8 caches ride with their dequant scales; primes need them
            # head-major ([L,B,H,M]) and the transpose MUST happen here,
            # outside the layer scan (inside it, it would re-materialize
            # the scale buffers once per layer).
            if quantized:
                # scales ride in their stored [L, B, M, H] layout for both
                # the q == 1 and the all-pairs prime kernels (in-kernel
                # pltpu.repeat replaced the old caller-side [L,B,H,M]
                # transpose hoist the per-head prime kernel needed)
                flash_kv = (cache["k"], cache["v"],
                            cache["k_scale"], cache["v_scale"])
            else:
                flash_kv = (cache["k"], cache["v"])
            mem_xs = (rk_full, cursor_per_layer,
                      jnp.arange(cfg.n_layer, dtype=jnp.int32))
        elif quantized:
            mem_xs = (cache["k"], cache["v"], cache["k_scale"],
                      cache["v_scale"], rk_full, cursor_per_layer)
        else:
            mem_xs = (cache["k"], cache["v"], rk_full, cursor_per_layer)
        h, (k_x, v_x) = self.layers(h, mem_xs, None, mask, r_w, r_r, True,
                                    flash_kv)
        n_commit = qlen - spec_tail
        assert 0 <= n_commit <= qlen, (qlen, spec_tail)
        if real_q is not None:
            logits = self.logits(jax.lax.dynamic_slice_in_dim(
                h, jnp.maximum(real_q - 1, 0), spec_tail + 1, axis=1))
            if not spec_tail:
                logits = logits[:, 0, :]
            # the masked commit below writes over the full qlen window
            n_commit = qlen
        elif spec_tail:
            logits = self.logits(h[:, max(n_commit - 1, 0):, :])
        else:
            logits = self.logits(h[:, -1:, :])[:, 0, :]
        if n_commit == 0:  # pure verify forward: nothing to write
            return logits, cache

        # write the n_commit new rows at (cursor + t) % M — no full-cache
        # copy. q == 1 (the per-action-dim decode steps, 6-7 of the 8
        # forwards per env step) can never wrap, so it uses
        # dynamic_update_slice: an index-vector scatter makes XLA pick a
        # scatter-friendly layout for the whole while-loop cache carry and
        # insert a ~100 MB/layer relayout copy in front of every score dot
        # (xprof-measured ~20 ms/step at 1.2B batch 24). Multi-token primes
        # can wrap and keep the modular scatter.
        k_x = jax.lax.stop_gradient(k_x)[:, :, :n_commit]
        v_x = jax.lax.stop_gradient(v_x)[:, :, :n_commit]
        if quantized:
            kv = {"k": quantize_kv_rows(k_x), "v": quantize_kv_rows(v_x)}
        if real_q is not None:
            # dynamic commit count: scatter all qlen rows modularly, but
            # rows >= real_q re-write the slot's CURRENT value (one small
            # [.., qlen, ..] gather — qlen is a prime width, never M), so
            # pad rows are no-ops and the cache equals the unpadded call's
            idx = (cursor + jnp.arange(n_commit)) % M
            keep = jnp.arange(n_commit) < real_q

            def put(buf, upd, axis=2):
                assert axis == 2
                sel = keep.reshape((1, 1, n_commit) + (1,) *
                                   (buf.ndim - 3))
                return buf.at[:, :, idx].set(
                    jnp.where(sel, upd, buf[:, :, idx]))
        elif n_commit == 1:
            def put(buf, upd, axis=2):
                return jax.lax.dynamic_update_slice_in_dim(
                    buf, upd, cursor, axis=axis)
        else:
            idx = (cursor + jnp.arange(n_commit)) % M

            def put(buf, upd, axis=2):
                assert axis == 2
                return buf.at[:, :, idx].set(upd)
        advance = n_commit if real_q is None else real_q
        if quantized:
            new_cache = {
                "k": put(cache["k"], kv["k"][0]),
                "v": put(cache["v"], kv["v"][0]),
                "k_scale": put(cache["k_scale"], kv["k"][1]),
                "v_scale": put(cache["v_scale"], kv["v"][1]),
                "cursor": (cursor + advance) % M,
            }
        else:
            new_cache = {
                "k": put(cache["k"], k_x),
                "v": put(cache["v"], v_x),
                "cursor": (cursor + advance) % M,
            }
        return logits, new_cache

    def _use_flash_decode(self, qlen: int) -> bool:
        """Gate for the fused Pallas ring-decode paths — q == 1 (per-action
        token) or a small multi-token prime, bf16 or int8(+scales) cache,
        shapes the kernels lower for; "auto" restricts to real TPUs ("on"
        runs interpret mode off-TPU, for tests)."""
        cfg = self.cfg
        from bdm_db1_tpu.ops.flash_ring_decode import MAX_PRIME_Q

        if not (1 <= qlen <= MAX_PRIME_Q) or cfg.decode_flash == "off":
            return False
        from bdm_db1_tpu.ops.flash_ring_decode import flash_ring_applicable

        n_head = cfg.n_head
        if self.decode_mesh is not None:
            # sharded decode: both the q == 1 kernel and the all-pairs
            # prime kernel run under a shard_map over ("data", "model") —
            # the (q, h) column flattening happens INSIDE the per-shard
            # body, so heads partition contiguously on the head-major
            # operands (flash_ring_decode/flash_ring_prime_ap mesh=...).
            # Applicability (sublane-even head replication) is per-shard.
            tp = self.decode_mesh.shape.get("model", 1)
            if n_head % tp:
                return False
            n_head //= tp
        if cfg.decode_flash == "on":
            # interpret mode has no tiling constraints; any block-even M works
            return cfg.mem_len % min(512, cfg.mem_len) == 0
        return (flash_ring_applicable(cfg.mem_len, n_head, cfg.d_head)
                and jax.devices()[0].platform == "tpu")  # "auto"

    def align_ring_cache(self, cache: Dict[str, Array]) -> Dict[str, Array]:
        """Rotate a ring cache back to aligned order (oldest at slot 0),
        as :meth:`decode_rl_kv` expects."""
        return {
            "k": jnp.roll(cache["k"], -cache["cursor"], axis=2),
            "v": jnp.roll(cache["v"], -cache["cursor"], axis=2),
        }

    def precompute_rk(self, qlen: int) -> Array:
        """Per-layer positional projections [n_layer, klen, H, Dh] for a
        decode geometry (r_net is input-independent)."""
        cfg = self.cfg
        klen = cfg.mem_len + qlen
        r = relative_positional_embedding(
            klen, cfg.n_embed, cfg.effective_clamp_len,
            dtype=jnp.dtype(cfg.dtype))
        kernels = self.variables["params"]["layers"]["attn"]["r_net"]["kernel"]
        kernels = getattr(kernels, "value", kernels)
        rk = jnp.einsum(
            "kd,lde->lke", r,
            kernels.astype(jnp.dtype(cfg.dtype)))
        return rk.reshape(cfg.n_layer, klen, cfg.n_head, cfg.d_head)

    def prime_ic_kv(
        self, prompt: Array, images: Array, text: Array,
        cache: Dict[str, Array],
    ) -> Tuple[Array, Dict[str, Array]]:
        """Fold an [prompt | image patches | text] prefix into the K/V cache
        and return last-position logits (image-captioning / VQA decoding)."""
        h = self.embed_ic(ICTaskBatch(prompt=prompt, images=images,
                                      text=text), deterministic=True)
        h, cache = self.trunk_kv(h, cache, deterministic=True)
        return self.logits(h[:, -1:, :])[:, 0, :], cache

    def decode_text_kv(
        self, tokens: Array, cache: Dict[str, Array]
    ) -> Tuple[Array, Dict[str, Array]]:
        """One text-generation step over the K/V cache (plain word
        embedding, no RL timestep term — the NLP/IC/VQA embedding path)."""
        h = self.word_embedding(tokens)
        h, cache = self.trunk_kv(h, cache, deterministic=True)
        return self.logits(h[:, -1:, :])[:, 0, :], cache

    def logits(self, h: Array) -> Array:
        if self.cfg.share_input_output_embedding:
            emb = self.word_embedding.embedding
            return jnp.einsum(
                "bld,vd->blv", h.astype(jnp.dtype(self.cfg.dtype)),
                emb.astype(jnp.dtype(self.cfg.dtype)),
            ).astype(jnp.float32)
        return self.lm_head(h).astype(jnp.float32)

    # ---- entry points ---------------------------------------------------------
    def embed_concat(
        self, batch: Dict[str, Any], deterministic: bool = True,
        with_targets: bool = True,
    ):
        """Embed every modality group and concatenate along batch (the input
        half of ``__call__``; split out so a pipelined trunk can run between
        embedding and the loss head). Returns (h, loss_mask, label) — the
        latter two None when with_targets=False."""
        embed_fns = {
            "rl": self.embed_rl, "nlp": self.embed_nlp,
            "ic": self.embed_ic, "vqa": self.embed_vqa,
        }
        # sub-modality groups: a key like "rl_img" routes to the base
        # modality's embedder ("rl"). The jitted step needs every group
        # shape-homogeneous and fixed-count per micro-batch; proprio RL
        # (no images) and image RL (fixed frame window) therefore ride as
        # SEPARATE groups of one mixture (data/samplers.py
        # StratifiedGatoLoader; the reference's my_collate_fn groups by
        # dataclass type and could never batch the two together either —
        # src/data/data_samplers.py:28-42)
        names = [n for n in MODALITY_ORDER if n in batch]
        names += sorted(k for k in batch if k not in MODALITY_ORDER
                        and k.split("_")[0] in embed_fns)
        embs, masks, labels = [], [], []
        for name in names:
            if batch[name] is None:
                continue
            sub = batch[name]
            embs.append(embed_fns[name.split("_")[0]](sub, deterministic))
            if with_targets:
                masks.append(sub.loss_mask)
                labels.append(jnp.maximum(sub.label, 0))
        h = jnp.concatenate(embs, axis=0) if len(embs) > 1 else embs[0]
        if not with_targets:
            return h, None, None
        return (h, jnp.concatenate(masks, axis=0).astype(jnp.float32),
                jnp.concatenate(labels, axis=0))

    def loss_from_hidden(self, h: Array, loss_mask: Array,
                         label: Array) -> Array:
        """Masked CE from trunk output (the loss head of ``__call__``); uses
        the blockwise fused CE for tied embeddings so the fp32 [B, L, V]
        logits never materialize."""
        if self.cfg.share_input_output_embedding:
            from bdm_db1_tpu.ops.fused_ce import masked_cross_entropy_fused

            return masked_cross_entropy_fused(
                h, self.word_embedding.embedding, label, loss_mask,
                self.layout.total_vocab_size)
        return masked_cross_entropy(self.logits(h), label, loss_mask,
                                    self.layout.total_vocab_size)

    def __call__(
        self,
        batch: Dict[str, Any],
        mems: Optional[Array] = None,
        compute_loss: bool = True,
        deterministic: bool = True,
        loss_only: bool = False,
    ):
        """Mixed-modality forward. ``batch`` maps modality name -> sub-batch;
        groups concatenate along batch for one trunk pass.

        ``loss_only=True`` (training hot path) returns ``(None, loss)`` and,
        for tied embeddings, routes through the blockwise fused CE
        (ops/fused_ce.py) so the fp32 [B, L, V] logits tensor never
        materializes."""
        assert not (compute_loss and mems is not None), (
            "training does not use segment memory"
        )
        h, loss_mask, label = self.embed_concat(
            batch, deterministic, with_targets=compute_loss)
        h, new_mems = self.trunk(h, mems, deterministic)

        if compute_loss and loss_only and self.cfg.share_input_output_embedding:
            return None, self.loss_from_hidden(h, loss_mask, label)

        logits = self.logits(h)

        loss = None
        if compute_loss:
            loss = masked_cross_entropy(logits, label, loss_mask,
                                        self.layout.total_vocab_size)
        if mems is not None:
            return logits, loss, new_mems
        return logits, loss

    def decode_rl(
        self,
        tokens: Array,          # [B, q]
        position_id: Array,     # [B, q]
        mems: Array,            # [n_layer, B, mem_len, D]
        images: Optional[Array] = None,  # [B, T, H, W, C]
    ) -> Tuple[Array, Array]:
        """One autoregressive eval step: returns (last-position logits
        [B, V], new mems). The caller applies action masking + argmax."""
        sub = RLTaskBatch(tokens=tokens, position_id=position_id, images=images)
        h = self.embed_rl(sub)
        h, new_mems = self.trunk(h, mems, deterministic=True)
        logits = self.logits(h[:, -1:, :])[:, 0, :]
        return logits, new_mems


def masked_cross_entropy(
    logits: Array, labels: Array, loss_mask: Array, valid_vocab: int
) -> Array:
    """Masked mean CE in fp32 (reference: src/model/transformer_xl.py:602-611).
    The MXU padding tail of the vocab is excluded from the softmax."""
    v = logits.shape[-1]
    if valid_vocab < v:
        pad_bias = jnp.where(jnp.arange(v) < valid_vocab, 0.0, -1e30)
        logits = logits + pad_bias
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return (nll * loss_mask).sum() / jnp.maximum(loss_mask.sum(), 1e-8)
