"""RTPT — process-title progress reporting ("Remaining Time To Process").

Equivalent of dafne/utils/rtpt.py:12-139: renames the process to
`@<initials>_<experiment>_[42%]#<eta>` with a moving-average ETA so cluster
operators can see run progress in `top`/`ps`.  Falls back to a status file
(`OUTPUT_DIR/rtpt_status`) when `setproctitle` is unavailable (it is not
baked into this image).
"""

from __future__ import annotations

import os
import time
from collections import deque
from typing import Optional

try:
    from setproctitle import setproctitle as _setproctitle
except Exception:  # pragma: no cover
    _setproctitle = None


def _fmt_eta(seconds: float) -> str:
    seconds = max(0, int(seconds))
    d, rem = divmod(seconds, 86400)
    h, rem = divmod(rem, 3600)
    m, s = divmod(rem, 60)
    if d:
        return f"{d}d:{h:02d}h"
    if h:
        return f"{h}h:{m:02d}m"
    return f"{m}m:{s:02d}s"


class RTPT:
    def __init__(
        self,
        name_initials: str = "SL",
        experiment_name: str = "dafne",
        max_iterations: int = 1,
        moving_avg_window_size: int = 20,
        status_file: Optional[str] = None,
    ):
        self.initials = name_initials
        self.experiment = experiment_name
        self.max_iterations = max(1, max_iterations)
        self.iteration = 0
        self.times = deque(maxlen=moving_avg_window_size)
        self.last = None
        self.status_file = status_file

    def start(self):
        self.last = time.time()
        self._update("--")

    def step(self, subtitle: str = "", iteration: Optional[int] = None):
        now = time.time()
        prev = self.iteration
        self.iteration = iteration if iteration is not None else prev + 1
        d_iter = max(1, self.iteration - prev)
        if self.last is not None:
            self.times.append((now - self.last) / d_iter)
        self.last = now
        if self.times:
            eta = _fmt_eta(
                (self.max_iterations - self.iteration)
                * (sum(self.times) / len(self.times))
            )
        else:
            eta = "--"
        self._update(eta, subtitle)

    def _update(self, eta: str, subtitle: str = ""):
        pct = int(100 * self.iteration / self.max_iterations)
        title = f"@{self.initials}_{self.experiment}_[{pct}%]#{eta}"
        if subtitle:
            title += f"_{subtitle}"
        if _setproctitle is not None:
            _setproctitle(title)
        if self.status_file:
            try:
                with open(self.status_file, "w") as f:
                    f.write(title + "\n")
            except OSError:
                pass
