#!/usr/bin/env python3
"""One-command mAP parity gate (SURVEY.md §7 stage 10; see RUNBOOK.md).

Runs the full released-checkpoint evaluation pipeline the day real data and
weights become available, in the reference's order (HRSC first — cheapest —
then DOTA-1.0):

  for each gate entry:
    1. config loads and freezes
    2. checkpoint file present (+ sha256 if RUNBOOK lists one) -> torch->flax
       import with a TOTAL mapping (0 unmatched / 0 unfilled)
    3. dataset present under $DAFNE_DATA_DIR in the expected layout
    4. tools/train.py --eval-only -> results.txt mAP
    5. compare against the reference's published mAP within the window

With --dry-run (no data/weights in this container) every step that can run
without them still runs for real: configs parse, a synthetic full-inventory
checkpoint exercises the import path end-to-end (total-mapping asserted),
and the pipeline itself is proven by a synthetic-dataset eval; the gate then
reports cleanly WHICH inputs are missing and exits 0.  Without --dry-run,
missing inputs exit non-zero.

Usage:
  python tools/parity_gate.py --dry-run              # container self-check
  DAFNE_DATA_DIR=/data DAFNE_CKPT_DIR=/ckpts python tools/parity_gate.py
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from dafne_tpu.utils.platform import pin_platform_from_env

# Gate table: the reference's released checkpoints (/root/reference/README.md
# pre-trained table).  Weight files are the Google-Drive releases; record a
# sha256 in RUNBOOK.md next to each file after download and paste it here
# (left None until then — the gate then only checks presence).
GATES = [
    {
        "name": "hrsc",
        "config": "configs/pre-trained/hrsc_r50_ms.yaml",
        "weights": "hrsc-r50-ms.pth",
        "sha256": None,
        "dataset_dirs": ["hrsc/FullDataSet/AllImages", "hrsc/FullDataSet/Annotations"],
        "eval_dataset": None,  # config's DATASETS.TEST
        "map_published": 89.76,
        "map_window": 0.3,
        "expect_minutes": 20,
    },
    {
        "name": "dota-1.0",
        "config": "configs/pre-trained/dota-1.0_r101_ms.yaml",
        "weights": "dota-1.0-r101-ms.pth",
        "sha256": None,
        "dataset_dirs": ["dota_1_split/val1024", "dota_1_split/val1024/DOTA1_val1024.json"],
        # The recipe's DATASETS.TEST is the reference's value-exact
        # dota_1_test_1024 (unlabeled — the published 76.95 is a DOTA
        # test-server number).  Local voc_eval needs GT, so the gate
        # evaluates the labeled val split, matching the reference's own
        # local-eval flow (dota_evaluation.py val path).
        "eval_dataset": "dota_1_val_1024",
        "map_published": 76.95,
        # The published 76.95 is a TEST-SERVER number and the local eval runs
        # the labeled VAL split — a different (unpublished) quantity, so a
        # tight two-sided window on it would spuriously fail a correct port
        # (or mis-certify a broken one that lands nearby).  The local gate is
        # therefore a SANITY FLOOR on val mAP; the definitive check is the
        # produced submission.zip scored by the DOTA evaluation server
        # against the published test number.
        "map_floor": 70.0,
        "protocol": "server",
        "expect_minutes": 240,  # TTA x15 augs over the val split
    },
]


def log(msg):
    print(f"[parity-gate] {msg}", flush=True)


def sha256_file(path):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while chunk := f.read(1 << 20):
            h.update(chunk)
    return h.hexdigest()


def check_config(gate):
    from dafne_tpu.config import load_config

    cfg = load_config(os.path.join(REPO, gate["config"]))
    cfg.freeze()
    log(f"{gate['name']}: config OK ({gate['config']})")
    return cfg


def check_weights(gate, cfg, dry_run):
    """Returns a loadable checkpoint path (real or, in dry-run, synthetic)."""
    ckpt_dir = os.environ.get("DAFNE_CKPT_DIR", os.path.join(REPO, "checkpoints"))
    path = os.path.join(ckpt_dir, gate["weights"])
    if os.path.exists(path):
        if gate["sha256"]:
            got = sha256_file(path)
            if got != gate["sha256"]:
                raise SystemExit(
                    f"{gate['name']}: sha256 mismatch for {path}: {got}"
                )
        log(f"{gate['name']}: weights present ({path})")
        return path, True
    if not dry_run:
        raise SystemExit(
            f"{gate['name']}: MISSING weights {path} — download from the "
            f"reference README table into $DAFNE_CKPT_DIR"
        )
    # dry run: prove the import path with a synthetic full-inventory ckpt
    log(f"{gate['name']}: weights missing -> synthetic import self-check")
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import numpy as np
    from test_weight_import_exhaustive import make_dafne_checkpoint

    import jax
    import jax.numpy as jnp
    from dafne_tpu.models import build_model
    from dafne_tpu.utils.weight_import import import_state_dict

    depth = cfg.MODEL.RESNETS.DEPTH
    ncls = cfg.MODEL.DAFNE.NUM_CLASSES
    sd = make_dafne_checkpoint(depth, ncls, np.random.RandomState(0))
    sd = {k: v for k, v in sd.items() if not k.startswith("pixel_")}
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))["params"]
    _, report = import_state_dict(sd, params)
    assert report.unmatched == [], report.unmatched[:5]
    assert report.unfilled == [], report.unfilled[:5]
    log(
        f"{gate['name']}: synthetic R-{depth} import total-mapping OK "
        f"({len(report.used)} tensors)"
    )
    return None, False


def check_dataset(gate, dry_run):
    root = os.environ.get("DAFNE_DATA_DIR", "/data")
    missing = [
        d for d in gate["dataset_dirs"]
        if not os.path.exists(os.path.join(root, d))
    ]
    if not missing:
        log(f"{gate['name']}: dataset present under {root}")
        return True
    if not dry_run:
        raise SystemExit(
            f"{gate['name']}: MISSING dataset paths under {root}: {missing} "
            f"— see RUNBOOK.md for the expected layout"
        )
    log(f"{gate['name']}: dataset missing ({missing[0]} ...) — dry run continues")
    return False


def run_eval(gate, weights_path, out_dir):
    cmd = [
        sys.executable, os.path.join(REPO, "tools", "train.py"),
        "--config-file", os.path.join(REPO, gate["config"]),
        "--eval-only",
        "MODEL.WEIGHTS", weights_path,
        "OUTPUT_DIR", out_dir,
    ]
    if gate.get("eval_dataset"):
        cmd += ["DATASETS.TEST", f'["{gate["eval_dataset"]}"]']
    log(f"{gate['name']}: eval (expect ~{gate['expect_minutes']} min): {' '.join(cmd)}")
    subprocess.run(cmd, check=True)
    results = _find_results_txt(out_dir)
    with open(results) as f:
        for line in f:
            if line.lower().startswith("map"):
                return float(line.split()[-1])
    raise SystemExit(f"{gate['name']}: no mAP line in {results}")


def _find_results_txt(out_dir):
    """results.txt lives under OUTPUT_DIR/inference/<dataset>/ (one per
    eval dataset; the gate recipes have exactly one)."""
    hits = []
    for root, _dirs, files in os.walk(out_dir):
        if "results.txt" in files:
            hits.append(os.path.join(root, "results.txt"))
    if not hits:
        raise SystemExit(f"no results.txt under {out_dir}")
    return sorted(hits)[0]


def dry_run_pipeline():
    """Prove the eval pipeline itself on the synthetic dataset (no data or
    weights needed): train.py --eval-only must produce Task1 files and a
    results.txt mAP."""
    out = tempfile.mkdtemp(prefix="parity_gate_dryrun_")
    cmd = [
        sys.executable, os.path.join(REPO, "tools", "train.py"),
        "--config-file", os.path.join(REPO, "configs", "synthetic", "base.yaml"),
        "--eval-only",
        "OUTPUT_DIR", out,
    ]
    log(f"pipeline dry run on synthetic dataset: {' '.join(cmd)}")
    subprocess.run(cmd, check=True)
    results = _find_results_txt(out)
    task1 = os.path.join(os.path.dirname(results), "task1")
    assert os.path.isdir(task1) and os.listdir(task1), task1
    log(f"pipeline dry run OK ({results})")


def main(argv=None):
    pin_platform_from_env()
    p = argparse.ArgumentParser()
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("--skip-pipeline-check", action="store_true",
                   help="dry run: skip the synthetic eval (config+import only)")
    args = p.parse_args(argv)

    summary = []
    for gate in GATES:
        cfg = check_config(gate)
        weights, have_w = check_weights(gate, cfg, args.dry_run)
        have_d = check_dataset(gate, args.dry_run)
        if have_w and have_d:
            out_dir = os.path.join(
                os.environ.get("DAFNE_OUTPUT_ROOT", "output"),
                f"parity_gate_{gate['name']}",
            )
            os.makedirs(out_dir, exist_ok=True)
            m = run_eval(gate, weights, out_dir)
            if gate.get("protocol") == "server":
                # local eval split != the published number's split (see the
                # gate table comment): sanity-floor locally, decide on the
                # evaluation server
                ok = m >= gate["map_floor"]
                summary.append({
                    "gate": gate["name"], "mAP": m,
                    "floor": gate["map_floor"],
                    "published_test_server": gate["map_published"],
                    "pass": ok, "protocol": "server",
                })
                log(f"{gate['name']}: val mAP {m:.2f} vs sanity floor "
                    f"{gate['map_floor']} -> {'PASS' if ok else 'FAIL'}; "
                    f"for the definitive verdict re-run --eval-only WITHOUT "
                    f"the DATASETS.TEST override (the recipe's own unlabeled "
                    f"{cfg.DATASETS.TEST} path emits submission.zip) and "
                    f"compare the DOTA-server score against "
                    f"{gate['map_published']} +/- 0.3")
            else:
                # two-sided: an anomalously HIGH mAP is the classic
                # signature of an eval/merge bug (duplicated detections,
                # leaked GT) and must not certify parity either
                ok = abs(m - gate["map_published"]) <= gate["map_window"]
                summary.append({"gate": gate["name"], "mAP": m,
                                "published": gate["map_published"],
                                "pass": ok})
                log(f"{gate['name']}: mAP {m:.2f} vs published "
                    f"{gate['map_published']} (window {gate['map_window']}) "
                    f"-> {'PASS' if ok else 'FAIL'}")
        else:
            summary.append({"gate": gate["name"], "mAP": None,
                            "missing": [x for x, ok in
                                        [("weights", have_w), ("data", have_d)]
                                        if not ok]})

    if args.dry_run and not args.skip_pipeline_check:
        dry_run_pipeline()

    print(json.dumps({"dry_run": args.dry_run, "gates": summary}))
    if not args.dry_run and any(g.get("pass") is False for g in summary):
        raise SystemExit(1)


if __name__ == "__main__":
    main()
