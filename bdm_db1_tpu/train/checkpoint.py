"""Orbax checkpointing (async) + resume.

Replaces DeepSpeed engine checkpoints (reference: src/checkpointing.py:17-22;
load at src/evaluation/evaluate_rl.py:509-511) with orbax sharded arrays.
Like the reference we persist a small client state (config echo + iteration
+ consumed samples) next to the arrays; unlike it, saves are async and
restore places every shard directly on its device.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, enable_async_checkpointing=True),
        )

    def save(self, step: int, state, client_state: Optional[Dict] = None):
        args = {"state": ocp.args.StandardSave(state)}
        if client_state is not None:
            args["client"] = ocp.args.JsonSave(client_state)
        self._mgr.save(step, args=ocp.args.Composite(**args))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template, step: Optional[int] = None):
        step = step if step is not None else self.latest_step()
        if step is None:
            return None, None
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template)),
        )
        client = None
        client_path = os.path.join(
            self.directory, str(step), "client", "metadata")
        try:
            restored_c = self._mgr.restore(
                step, args=ocp.args.Composite(client=ocp.args.JsonRestore()))
            client = restored_c.get("client")
        except Exception:
            pass
        return restored["state"], client

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
