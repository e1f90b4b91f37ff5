"""Smoke tests for the host-side visualization CLIs (no jit, pure cv2).

Each tool runs as a subprocess against the synthetic dataset and must
write rendered pngs — the same contract the reference's visualize_data.py /
visualize_json_results.py fulfill.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, **env_extra):
    env = dict(os.environ, DAFNE_PLATFORM="cpu", **env_extra)
    return subprocess.run(
        [sys.executable] + args, cwd=REPO, env=env,
        capture_output=True, text=True, timeout=300,
    )


def test_visualize_data_writes_pngs(tmp_path):
    out = tmp_path / "vis"
    r = _run(
        ["tools/visualize_data.py", "--config-file", "configs/synthetic/base.yaml",
         "--source", "annotation", "--num-images", "2",
         "--output-dir", str(out)]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    pngs = [f for f in os.listdir(out) if f.endswith(".png")]
    assert len(pngs) == 2, (pngs, r.stdout[-500:])


def test_visualize_json_results_writes_pngs(tmp_path):
    # fabricate a Task1 file for the synthetic val set, then render it
    import numpy as np

    sys.path.insert(0, REPO)
    from dafne_tpu.config import get_cfg
    from dafne_tpu.data import DatasetCatalog, register_all_datasets

    cfg = get_cfg()
    cfg.merge_from_file("configs/synthetic/base.yaml")
    register_all_datasets(cfg)
    records = DatasetCatalog.get("synthetic_val")[:2]

    task1 = tmp_path / "task1"
    os.makedirs(task1)
    lines = []
    for r in records:
        a = r["annotations"][0]
        coords = " ".join(f"{v:.2f}" for v in a["corners"])
        lines.append(f"{r['image_id']} 0.95 {coords}")
    (task1 / "Task1_stripe.txt").write_text("\n".join(lines) + "\n")

    out = tmp_path / "vis_pred"
    r = _run(
        ["tools/visualize_json_results.py",
         "--config-file", "configs/synthetic/base.yaml",
         "--task1-dir", str(task1), "--dataset", "synthetic_val",
         "--num-images", "2", "--output-dir", str(out)]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    pngs = [f for f in os.listdir(out) if f.endswith(".png")]
    assert len(pngs) >= 1, (pngs, r.stdout[-500:])


def test_run_launcher_user_opts_win(tmp_path):
    """Regression: run.py must place launcher-derived overrides BEFORE user
    KEY VALUE opts (merge_from_list is later-wins), so an explicit user
    SOLVER.MAX_ITER survives --iter-scale."""
    r = _run(
        ["tools/run.py", "train", "--config-file", "configs/synthetic/base.yaml",
         "--tag", "t1", "--iter-scale", "2", "--dry-run",
         "SOLVER.MAX_ITER", "123"]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    cmd = r.stdout.strip().splitlines()[-1]
    # the user's value must appear AFTER the derived one
    derived = cmd.index("SOLVER.MAX_ITER 500")  # 1000 / scale 2
    user = cmd.index("SOLVER.MAX_ITER 123")
    assert user > derived, cmd
