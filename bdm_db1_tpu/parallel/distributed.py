"""Multi-controller (multi-host) bootstrap.

Counterpart of the reference's ``deepspeed.init_distributed`` call
(reference: src/evaluation/evaluate_rl.py:492; torch.distributed env-var
rendezvous). The JAX equivalent, ``jax.distributed.initialize()``, must run
BEFORE the first backend touch — and ``jax.process_count()`` reads 1 until
it has run, so guarding it behind ``process_count() > 1`` (as earlier
revisions of this repo did) is unreachable dead code. Detection therefore
looks at the *launcher's* environment: the coordinator/world-size variables
that SLURM, OpenMPI, and Cloud TPU pod runtimes export, all of which
``jax.distributed.initialize()`` itself knows how to consume.
"""

from __future__ import annotations

import os
from typing import Mapping, Optional

# presence of any of these implies a multi-process launch
_COORDINATOR_VARS = (
    "JAX_COORDINATOR_ADDRESS",        # explicit jax rendezvous
    "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",  # TPU multislice
)
# numeric world sizes; > 1 implies a multi-process launch. These must be
# PER-RANK variables (set by srun/mpirun on each launched process), not
# allocation-level ones: SLURM_NTASKS describes the sbatch allocation and
# is visible to a single un-srun'd python too — keying on it would make a
# lone driver rendezvous-hang waiting for ranks that never start.
_WORLD_SIZE_VARS = (
    "JAX_NUM_PROCESSES",
    "SLURM_STEP_NUM_TASKS",   # set by srun for the job step's ranks
    "OMPI_COMM_WORLD_SIZE",   # set by mpirun per rank
    "PMI_SIZE",               # set by the PMI launcher per rank
)
# Cloud TPU pods export the full worker list to every worker
_TPU_HOSTLIST_VAR = "TPU_WORKER_HOSTNAMES"

_initialized = False


def detect_multihost(environ: Optional[Mapping[str, str]] = None) -> bool:
    """True when the process environment indicates a multi-process launch."""
    env = os.environ if environ is None else environ
    if any(env.get(k) for k in _COORDINATOR_VARS):
        return True
    for k in _WORLD_SIZE_VARS:
        v = env.get(k, "").strip()
        if v.isdigit() and int(v) > 1:
            return True
    hosts = env.get(_TPU_HOSTLIST_VAR, "").strip()
    if hosts and len(hosts.split(",")) > 1:
        return True
    return False


def maybe_initialize_distributed(
    force: Optional[bool] = None,
    environ: Optional[Mapping[str, str]] = None,
    _jax_distributed=None,
) -> bool:
    """Initialize ``jax.distributed`` when appropriate; returns whether it ran.

    Call this at driver entry, before any ``jax.devices()`` / jit / array
    creation. ``force`` is the ``--mesh.multihost`` tri-state: ``True``
    always initializes, ``False`` never does, ``None`` (default)
    auto-detects via :func:`detect_multihost`. Idempotent across drivers in
    one process. ``environ`` / ``_jax_distributed`` exist for unit tests.
    """
    global _initialized
    if _initialized or force is False:
        return False
    if force is None and not detect_multihost(environ):
        return False
    dist = _jax_distributed
    if dist is None:  # pragma: no cover — needs a real multi-host launch
        import jax

        dist = jax.distributed
    dist.initialize()
    _initialized = True
    return True
