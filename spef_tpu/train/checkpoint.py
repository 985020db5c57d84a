"""Mid-training checkpoint / resume — orbax-backed.

The reference has save-only persistence (state_dict at the end,
`/root/reference/src/modeling/model.py:70-89`; best model kept in memory,
`src/tools/training.py:173-190`) and no mid-training resume (SURVEY.md §5).
This module closes that gap: full TrainState (params, BN stats, optimizer
state, step) plus host-side bookkeeping (epoch, best loss, RNG) is
checkpointed every epoch and restorable, so long QAT runs survive
preemption — table stakes for production TPU training.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

__all__ = ["CheckpointManager"]


class CheckpointManager:
    """Epoch-granular checkpointing of TrainState + trainer bookkeeping."""

    def __init__(self, directory: str, max_to_keep: int = 2):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, epoch: int, state, meta: Optional[Dict[str, Any]] = None) -> None:
        """Save the pytree parts of the state + a JSON metadata sidecar."""
        payload = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        self._mngr.save(epoch, args=self._ocp.args.StandardSave(payload))
        self._mngr.wait_until_finished()
        if meta is not None:
            with open(os.path.join(self.directory, f"meta_{epoch}.json"), "w") as f:
                json.dump(meta, f, default=float)

    def latest_epoch(self) -> Optional[int]:
        return self._mngr.latest_step()

    def save_best(self, params, batch_stats, meta: Optional[Dict[str, Any]] = None) -> str:
        """Durably persist the best-so-far model (params + BN stats).

        The trainer keeps the running best in host memory and only writes it
        after the final epoch (reference behaviour, `training.py:173-190`);
        on preemption that best would be lost even with epoch checkpoints,
        because the *latest* state is not the *best* state.  Writing a small
        msgpack at every improvement makes the best model durable.
        """
        from flax import serialization

        path = os.path.join(self.directory, "best_model.msgpack")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(serialization.to_bytes(
                {"params": params, "batch_stats": batch_stats}))
        os.replace(tmp, path)
        if meta is not None:
            with open(os.path.join(self.directory, "best_meta.json"), "w") as f:
                json.dump(meta, f, default=float)
        return path

    def restore(self, state, epoch: Optional[int] = None) -> Tuple[Any, Dict[str, Any]]:
        """Restore into a template TrainState; returns (state, meta)."""
        epoch = epoch if epoch is not None else self.latest_epoch()
        assert epoch is not None, f"No checkpoints in {self.directory}"
        template = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        restored = self._mngr.restore(epoch, args=self._ocp.args.StandardRestore(template))
        new_state = state.replace(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )
        meta_path = os.path.join(self.directory, f"meta_{epoch}.json")
        meta: Dict[str, Any] = {"epoch": epoch}
        if os.path.isfile(meta_path):
            with open(meta_path) as f:
                meta.update(json.load(f))
        return new_state, meta
