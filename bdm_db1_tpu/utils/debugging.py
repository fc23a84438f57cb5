"""Numerical-health tooling.

Counterpart of the reference's inline robustness checks — the ``check_nan``
parameter scanner (reference: src/model/utils.py:31-47) and the loss
overflow warning (reference: src/model/transformer_xl.py:610-611) — plus
jax-native equivalents: checkify-wrapped NaN checking inside jit and an
on-device global-finiteness probe cheap enough to run every step.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bdm_db1_tpu.core.logging import print_with_rank


def check_nan(tree: Any, prefix: str = "params") -> List[str]:
    """Host-side scan: returns the paths of non-finite leaves and prints a
    warning per hit (reference: model/utils.py:31-47 check_nan)."""
    bad = []
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            name = prefix + jax.tree_util.keystr(path)
            bad.append(name)
            print_with_rank(f"WARNING: non-finite values in {name}")
    return bad


def global_finite(tree: Any) -> jnp.ndarray:
    """Jit-safe: True iff every leaf is finite (one scalar, fused reduce)."""
    leaves = [jnp.isfinite(x).all() for x in jax.tree.leaves(tree)
              if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)]
    if not leaves:
        return jnp.asarray(True)
    return jnp.stack(leaves).all()


def warn_on_overflow(loss: jnp.ndarray) -> None:
    """Host check after a step (reference: transformer_xl.py:610-611)."""
    v = float(loss)
    if not np.isfinite(v):
        print_with_rank("WARNING: Loss Overflow.")


def checkify_nan_errors(fn):
    """Wrap a jitted function with checkify NaN/div error tracking:
    ``err, out = wrapped(...); err.throw()``."""
    from jax.experimental import checkify

    return checkify.checkify(
        fn, errors=checkify.float_checks)
