"""Typed device-side batches (jax pytrees).

Replaces the reference's tensor-tree dataclasses
(reference: src/data/input_specs.py:23-112) with ``flax.struct`` pytrees that
obey jit's static-shape rule: every modality group packs to the same sequence
length ``L`` (= n_position) and groups are concatenated along batch inside the
model, mirroring the reference's per-type dispatch + concat
(reference: src/model/transformer_xl.py:519-544) without ragged shapes.

Images are NHWC (TPU-preferred conv layout); the host pipeline converts from
the reference's CHW storage at batch build time.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RLTaskBatch:
    """Packed decision-transformer sample; image slots hold token id -1."""

    tokens: jnp.ndarray        # [B, L] int32
    position_id: jnp.ndarray   # [B, L] int32 local-timestep ids (0 = action)
    loss_mask: Optional[jnp.ndarray] = None   # [B, L]
    label: Optional[jnp.ndarray] = None       # [B, L] int32
    images: Optional[jnp.ndarray] = None      # [B, T, H, W, C] float


@struct.dataclass
class NLPTaskBatch:
    tokens: jnp.ndarray        # [B, L] int32
    loss_mask: Optional[jnp.ndarray] = None
    label: Optional[jnp.ndarray] = None


@struct.dataclass
class ICTaskBatch:
    """Image captioning: [prompt | image patches | caption]."""

    prompt: jnp.ndarray        # [B, P] int32
    images: jnp.ndarray        # [B, H, W, C] float
    text: jnp.ndarray          # [B, Lt] int32
    loss_mask: Optional[jnp.ndarray] = None   # [B, L] over the packed sequence
    label: Optional[jnp.ndarray] = None       # [B, L]


@struct.dataclass
class VQATaskBatch:
    """VQA: [prompt | image patches | question + answer]."""

    prompt: jnp.ndarray
    images: jnp.ndarray
    text: jnp.ndarray
    ques_len: jnp.ndarray      # [B] int32
    loss_mask: Optional[jnp.ndarray] = None
    label: Optional[jnp.ndarray] = None


# A mixed-modality global batch: modality name -> fixed-shape sub-batch.
# Keys (when present): "rl", "nlp", "ic", "vqa".
GatoBatch = Dict[str, object]

MODALITY_ORDER = ("rl", "nlp", "ic", "vqa")
