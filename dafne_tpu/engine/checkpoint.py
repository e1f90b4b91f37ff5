"""Orbax checkpointing with resume-or-bootstrap semantics.

Replaces Detectron2's DetectionCheckpointer + PeriodicCheckpointer
(tools/plain_train_net.py:393-412,485): bundles params/opt_state/step,
keeps the last K checkpoints, and `resume_or_load` either resumes the run
from OUTPUT_DIR or bootstraps weights from MODEL.WEIGHTS (a torch/Detectron2
pickle goes through the weight importer; an orbax dir restores params only).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, output_dir: str, max_to_keep: int = 5):
        self.dir = os.path.abspath(os.path.join(output_dir, "checkpoints"))
        os.makedirs(self.dir, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state) -> None:
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
        }
        if getattr(state, "batch_stats", None) is not None:
            payload["batch_stats"] = state.batch_stats
        self.manager.save(step, args=ocp.args.StandardSave(payload))

    def wait(self):
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state):
        """Restore into the structure of `state`; returns the restored state."""
        step = self.manager.latest_step()
        if step is None:
            return state, 0
        template = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
        }
        if getattr(state, "batch_stats", None) is not None:
            template["batch_stats"] = state.batch_stats
        restored = self.manager.restore(
            step, args=ocp.args.StandardRestore(template)
        )
        new_state = state.replace(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=jax.numpy.asarray(restored["step"]),
        )
        if "batch_stats" in restored:
            new_state = new_state.replace(batch_stats=restored["batch_stats"])
        return new_state, int(restored["step"])

    def resume_or_load(self, state, cfg, resume: bool):
        """Resume from OUTPUT_DIR if requested and possible; else bootstrap
        MODEL.WEIGHTS (torch .pkl/.pth via the importer) into params."""
        if resume and self.latest_step() is not None:
            return self.restore(state)
        weights = cfg.MODEL.WEIGHTS
        if weights and os.path.exists(weights):
            from dafne_tpu.utils.weight_import import load_reference_weights

            params = load_reference_weights(weights, state.params)
            state = state.replace(params=params)
        return state, 0
