"""Gato vision patch embedder (ResNet-v2 block + quantized in-patch positions).

Re-design of the reference vision encoder
(reference: src/tokenizer/vision_embedding.py:36-180) in NHWC (the TPU conv
layout). Pipeline per image:

  1. split into ``patch_size`` x ``patch_size`` patches,
  2. per-patch, per-channel normalize to mean 0 / std 1 (unbiased std, +1e-6)
     then divide by sqrt(patch_size),
  3. ResNet-v2-style block: conv3x3 -> (GN32 + GELU + conv3x3) x2 residual,
  4. stride-``patch_size`` conv projection to the embedding dim,
  5. add row/col positional embeddings quantized to a 128-entry vocab —
     uniform-random inside the patch's interval during training, interval
     midpoint at eval (reference: src/tokenizer/vision_embedding.py:150-176).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from bdm_db1_tpu.core.config import ModelConfig, VisionConfig
from bdm_db1_tpu.models.activations import gelu


class PatchEmbeddings(nn.Module):
    cfg: ModelConfig
    vision: VisionConfig

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """[B, H, W, C] -> [B, (H/p)*(W/p), D]."""
        p = self.vision.patch_size
        b, h, w, c = pixels.shape
        h0, w0 = h // p, w // p
        dtype = jnp.dtype(self.cfg.dtype)

        # patchify: [B, h0, p, w0, p, C] -> [B*h0*w0, p, p, C]
        x = pixels.reshape(b, h0, p, w0, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b * h0 * w0, p, p, c)

        # per-patch, per-channel normalization with unbiased std (torch default)
        x = x.astype(jnp.float32)
        mean = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True, ddof=1)
        x = (x - mean) / (1e-6 + jnp.sqrt(var))
        x = x / jnp.sqrt(float(p))
        x = x.astype(dtype)

        conv = lambda feat, name, **kw: nn.Conv(
            feat, (3, 3), padding=1, dtype=dtype, param_dtype=self.cfg.param_dtype,
            name=name, **kw,
        )
        gn = lambda name: nn.GroupNorm(
            num_groups=32, epsilon=1e-5, dtype=dtype,
            param_dtype=self.cfg.param_dtype, name=name,
        )

        x = conv(64, "conv_in")(x)
        res = x
        x = gn("gn1")(x)
        x = gelu(x)
        x = conv(64, "conv_mid1")(x)
        x = gn("gn2")(x)
        x = gelu(x)
        x = conv(64, "conv_mid2")(x)
        x = res + x
        x = nn.Conv(
            self.cfg.n_embed, (p, p), strides=(p, p), dtype=dtype,
            param_dtype=self.cfg.param_dtype, name="projection",
        )(x)  # [B*h0*w0, 1, 1, D]
        return x.reshape(b, h0 * w0, self.cfg.n_embed)


class VisionEmbedding(nn.Module):
    cfg: ModelConfig
    vision: VisionConfig

    @nn.compact
    def __call__(self, pixels: jnp.ndarray, deterministic: bool = True):
        """[B, H, W, C] -> [B, S, D] patch embeddings with positional codes."""
        p = self.vision.patch_size
        pv = self.vision.position_vocab_size
        b, h, w, _ = pixels.shape
        h0, w0 = h // p, w // p
        seq_len = h0 * w0

        emb = PatchEmbeddings(self.cfg, self.vision, name="patch")(pixels)

        row_table = nn.Embed(
            pv, self.cfg.n_embed, dtype=jnp.dtype(self.cfg.dtype),
            param_dtype=self.cfg.param_dtype,
            embedding_init=nn.initializers.normal(0.02), name="row_pos",
        )
        col_table = nn.Embed(
            pv, self.cfg.n_embed, dtype=jnp.dtype(self.cfg.dtype),
            param_dtype=self.cfg.param_dtype,
            embedding_init=nn.initializers.normal(0.02), name="col_pos",
        )

        seq_idx = jnp.arange(seq_len)
        row_idx = seq_idx // w0
        col_idx = seq_idx % w0
        row_low = (row_idx / h0 * pv).astype(jnp.int32)
        row_high = ((row_idx + 1) / h0 * pv).astype(jnp.int32)
        col_low = (col_idx / w0 * pv).astype(jnp.int32)
        col_high = ((col_idx + 1) / w0 * pv).astype(jnp.int32)

        if deterministic:
            row_ids = jnp.broadcast_to((row_low + row_high) // 2, (b, seq_len))
            col_ids = jnp.broadcast_to((col_low + col_high) // 2, (b, seq_len))
        else:
            rng = self.make_rng("patch_pos")
            r1, r2 = jax.random.split(rng)
            row_ids = jax.random.randint(r1, (b, seq_len), row_low, row_high)
            col_ids = jax.random.randint(r2, (b, seq_len), col_low, col_high)

        return emb + row_table(row_ids) + col_table(col_ids)
