"""CI rehearsal of the real-data mAP parity gate (tools/parity_gate.py).

The gate is the single command the whole parity effort funnels into when
DOTA/HRSC data + released checkpoints appear (RUNBOOK.md); its --dry-run
mode runs everything that works without them — config parse/freeze for
both gate recipes, a synthetic full-inventory torch->flax import with a
TOTAL mapping asserted, and the eval pipeline end-to-end on the synthetic
dataset (train.py --eval-only -> Task1 files -> results.txt mAP).  This
test invokes the actual script so the gate cannot rot silently
(VERDICT r4 #5)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_parity_gate_dry_run():
    env = dict(os.environ, DAFNE_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "parity_gate.py"),
         "--dry-run"],
        capture_output=True, text=True, timeout=1800, cwd=REPO, env=env,
    )
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["dry_run"] is True
    assert [g["gate"] for g in out["gates"]] == ["hrsc", "dota-1.0"]
    # in-container: both gates must report exactly what is missing (data +
    # weights), never a silent pass/fail
    for g in out["gates"]:
        assert g["mAP"] is None and set(g["missing"]) == {"weights", "data"}
    # the synthetic-pipeline proof ran (emits its OK line)
    assert "pipeline dry run OK" in r.stdout
