"""Device mesh + logical sharding rules (the real TP the reference stubs).

The reference keeps Megatron-style TP/PP process-group bookkeeping but never
implements parallel layers (reference: src/mpu/initialize.py:54-398, README
"TP/PP were not applied"). Here parallelism is declarative: a
("data", "model") mesh over ICI/DCN, flax logical axis names on every weight
(see models/transformer_xl.py), and the rules below map them to mesh axes —
XLA inserts the all-gathers/reduce-scatters.

Axis placement:
  * batch            -> data            (DP: gradient psum falls out of pjit)
  * vocab            -> model           (tied embedding/LM head column-split;
                                         logits reduce over ICI)
  * qkv / heads/ mlp -> model           (Megatron-style column/row split)
  * embed / head_dim -> replicated
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from bdm_db1_tpu.core.config import MeshConfig

# flax logical axis name -> mesh axis
LOGICAL_AXIS_RULES: Tuple[Tuple[str, Optional[str]], ...] = (
    ("batch", "data"),
    ("length", None),
    ("length_sharded", "model"),  # Megatron-SP activation sharding
    ("vocab", "model"),
    ("embed", None),
    ("qkv", "model"),
    ("heads", "model"),
    ("head_dim", None),
    ("mlp", "model"),
    ("layers", None),
)


def axis_rules(mesh: Mesh) -> Tuple[Tuple[str, Optional[str]], ...]:
    """Logical rules for a mesh: on a pipelined mesh the stacked layer
    axis shards across stages (parallel/pipeline.py); otherwise replicated."""
    if "pipe" in mesh.axis_names:
        return tuple(("layers", "pipe") if name == "layers" else (name, tgt)
                     for name, tgt in LOGICAL_AXIS_RULES)
    return LOGICAL_AXIS_RULES


def make_mesh(cfg: MeshConfig, devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    tp = max(1, cfg.model_parallel)
    pp = max(1, cfg.pipeline_parallel)
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n // (tp * pp)
    if pp > 1:
        assert dp * pp * tp == n, f"mesh {dp}x{pp}x{tp} != {n} devices"
        shape, names = (dp, pp, tp), ("data", "pipe", "model")
    else:
        assert dp * tp == n, f"mesh {dp}x{tp} != {n} devices"
        shape, names = (dp, tp), cfg.axis_names
    try:
        dev_array = mesh_utils.create_device_mesh(shape, devices=devices)
    except Exception:  # non-TPU topologies (CPU tests)
        dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, names)


def logical_to_sharding(logical_spec, mesh: Mesh) -> NamedSharding:
    """Map a flax logical-axis tuple to a NamedSharding via the rules."""
    rules = dict(axis_rules(mesh))
    axes = tuple(
        rules.get(name) if name is not None else None for name in logical_spec
    )
    return NamedSharding(mesh, PartitionSpec(*axes))


def params_shardings(abstract_params, mesh: Mesh):
    """Annotated (nn.with_logical_partitioning) abstract params ->
    matching NamedSharding tree."""
    import flax.linen as nn

    logical = nn.get_partition_spec(abstract_params)
    return jax.tree.map(
        lambda spec: logical_to_sharding(spec, mesh),
        logical,
        is_leaf=lambda x: isinstance(x, PartitionSpec),
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Global batches shard along the data axis, replicate along model."""
    return NamedSharding(mesh, PartitionSpec("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def ring_cache_shardings(mesh: Mesh, cache, data: Optional[str] = "data"
                         ) -> dict:
    """NamedShardings for a decode ring cache (eval/decode.py sharded
    decode): batch shards over ``data`` (independent env rows; pass None
    to replicate, e.g. a batch that doesn't divide the axis), heads over
    "model" (attention heads are TP-independent until the output
    projection — the same Megatron split the trunk weights use), layers/
    positions replicated. Matches the {"k","v"[,"k_scale","v_scale"],
    "cursor"} layouts of TransformerXL.init_kv_cache_ring."""
    out = {}
    for name, leaf in cache.items():
        if name == "cursor":
            out[name] = replicated(mesh)
        else:  # [L, B, M, H(, Dh)] — kv scales have no trailing Dh
            spec = (data if i == 1 else ("model" if i == 3 else None)
                    for i in range(leaf.ndim))
            out[name] = NamedSharding(mesh, PartitionSpec(*spec))
    return out
