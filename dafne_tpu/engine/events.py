"""Metric writers: terminal, JSONL, TensorBoard.

The trio the reference wires on rank 0 (plain_train_net.py:414-422:
CommonMetricPrinter, JSONWriter -> metrics.json, TensorboardXWriter).
Under single-program SPMD there is no rank gating — there is one host
process per run (multi-host runs gate on jax.process_index() == 0).
"""

from __future__ import annotations

import datetime
import json
import logging
import os
import time
from collections import deque
from typing import Dict, Optional

logger = logging.getLogger("dafne_tpu")


class EventWriter:
    def write(self, step: int, metrics: Dict[str, float]) -> None:
        raise NotImplementedError

    def close(self) -> None:
        pass


class TerminalWriter(EventWriter):
    """CommonMetricPrinter-style: smoothed losses, it/s, ETA."""

    def __init__(self, max_iter: int, window: int = 20):
        self.max_iter = max_iter
        self.times = deque(maxlen=window)
        self.last = None
        self.last_step = None

    def write(self, step, metrics):
        now = time.perf_counter()
        if self.last is not None and step > self.last_step:
            # per-iteration time even when writes happen every N iters
            self.times.append((now - self.last) / (step - self.last_step))
        self.last = now
        self.last_step = step
        eta = ""
        if self.times:
            per_it = sum(self.times) / len(self.times)
            remaining = (self.max_iter - step) * per_it
            eta = f" eta: {datetime.timedelta(seconds=int(remaining))}"
            speed = f" {1.0 / per_it:.2f} it/s"
        else:
            speed = ""
        parts = [
            f"{k}: {v:.4g}" for k, v in sorted(metrics.items())
            if isinstance(v, (int, float))
        ]
        logger.info(f"iter {step}/{self.max_iter}{eta}{speed}  " + "  ".join(parts))


class JSONWriter(EventWriter):
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        self.f = open(path, "a")

    def write(self, step, metrics):
        rec = {"iteration": step}
        rec.update(
            {k: float(v) for k, v in metrics.items() if isinstance(v, (int, float))}
        )
        self.f.write(json.dumps(rec) + "\n")
        self.f.flush()

    def close(self):
        self.f.close()


class TensorBoardWriter(EventWriter):
    def __init__(self, log_dir: str):
        try:
            import tensorflow as tf

            self.writer = tf.summary.create_file_writer(log_dir)
            self.tf = tf
        except Exception:
            self.writer = None

    def write(self, step, metrics):
        if self.writer is None:
            return
        with self.writer.as_default():
            for k, v in metrics.items():
                if isinstance(v, (int, float)):
                    self.tf.summary.scalar(k, v, step=step)

    def close(self):
        if self.writer is not None:
            self.writer.close()


def build_writers(output_dir: str, max_iter: int):
    return [
        TerminalWriter(max_iter),
        JSONWriter(os.path.join(output_dir, "metrics.json")),
        TensorBoardWriter(os.path.join(output_dir, "tb")),
    ]
