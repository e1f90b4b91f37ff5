"""Orbax checkpointing with resume-or-bootstrap semantics.

Replaces Detectron2's DetectionCheckpointer + PeriodicCheckpointer
(tools/plain_train_net.py:393-412,485): bundles params/opt_state/step,
keeps the last K checkpoints, and `resume_or_load` either resumes the run
from OUTPUT_DIR or bootstraps weights from MODEL.WEIGHTS (a torch/Detectron2
pickle goes through the weight importer; an orbax dir restores params only).

Periodic saves are ASYNC (`save_async`, SURVEY §5.4): the step loop's only
cost is an on-device snapshot copy (so the buffers the loop donates into the
next step stay out of the save); a single worker thread then does the
device->host fetch and the orbax save (whose disk write is itself async,
``enable_async_checkpointing``), serialized with an explicit
finalize-barrier per save so multi-process rank cooperation keeps one
deterministic order.  Worker failures surface on the next save_async/wait
call — a checkpoint can't be lost silently.  Resume reads only FINALIZED
steps; orbax ignores and replaces ``*.orbax-checkpoint-tmp`` leftovers from
a kill mid-write (drilled for real in
__graft_entry__.dryrun_multiprocess_kill_resume).
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _device_snapshot(state):
    """Copy the state's device buffers (jitted tree-copy: fresh buffers, no
    aliasing with the originals the train loop is about to donate)."""
    import jax.numpy as jnp

    return jax.jit(
        lambda t: jax.tree_util.tree_map(jnp.copy, t)
    )(state)


class Checkpointer:
    def __init__(self, output_dir: str, max_to_keep: int = 5):
        self.dir = os.path.abspath(os.path.join(output_dir, "checkpoints"))
        os.makedirs(self.dir, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                create=True,
                # async disk writes; the explicit barrier is
                # wait_until_finished in the worker / wait()
                enable_async_checkpointing=True,
            ),
        )
        self._queue: "queue.Queue" = queue.Queue()
        self._worker: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None
        # drill hook: pad the payload by N MB so a kill-during-save drill
        # has a real write window to land in (never set in production)
        self._pad_mb = int(os.environ.get("DAFNE_TEST_CKPT_PAD_MB", "0"))

    # ------------------------------------------------------------ payloads
    def _payload(self, state) -> dict:
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
        }
        if getattr(state, "batch_stats", None) is not None:
            payload["batch_stats"] = state.batch_stats
        if self._pad_mb:
            # (MB << 17) float64 elements * 8 bytes = MB megabytes; random
            # values so the write can't be compressed away
            payload["_drill_pad"] = np.random.RandomState(0).rand(
                self._pad_mb << 17
            )
        return payload

    # ---------------------------------------------------------------- sync
    def save(self, step: int, state) -> None:
        """Synchronous-entry save (async disk write); used by the async
        worker and directly by tools that already hold a host-side state."""
        self.manager.save(step, args=ocp.args.StandardSave(self._payload(state)))

    # --------------------------------------------------------------- async
    def _raise_pending(self):
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("async checkpoint save failed") from err

    def _worker_loop(self):
        while True:
            item = self._queue.get()
            if item is None:
                self._queue.task_done()
                return
            step, snap = item
            try:
                host_state = jax.device_get(snap)
                self.save(step, host_state)
                # finalize-barrier: one save in flight at a time — the next
                # queued save (a rank-cooperation point under multi-process)
                # starts only after this one's write is durable
                self.manager.wait_until_finished()
            except BaseException as e:  # surfaced on next save/wait
                self._error = e
            finally:
                self._queue.task_done()

    def save_async(self, step: int, state) -> None:
        """Enqueue a checkpoint save; returns after an on-device snapshot
        copy (ms) — the D2H fetch and write happen on the worker thread."""
        self._raise_pending()
        snap = _device_snapshot(state)
        if self._worker is None or not self._worker.is_alive():
            self._worker = threading.Thread(
                target=self._worker_loop, name="ckpt-saver", daemon=True
            )
            self._worker.start()
        self._queue.put((step, snap))

    def wait(self):
        """Drain queued async saves and the orbax write pipeline."""
        if self._worker is not None and self._worker.is_alive():
            self._queue.join()
        self.manager.wait_until_finished()
        self._raise_pending()

    # ------------------------------------------------------------- restore
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
        if self._pad_mb:
            template["_drill_pad"] = np.zeros(self._pad_mb << 17)
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
