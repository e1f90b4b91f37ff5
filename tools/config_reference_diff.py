"""Semantic value diff of every shipped recipe against the reference YAMLs.

For each of the 19 reference config files (/root/reference/configs/**), this
resolves the reference chain (plain YAML + ``_BASE_`` inheritance — no
detectron2 needed; the pre-trained files are flat frozen dumps) and the repo's
same-named recipe through ``dafne_tpu.config.load_config``, then compares
every key that exists in BOTH the resolved reference tree and the repo's
default schema.  Keys outside the repo schema (detectron2-only: RPN,
ROI_HEADS, ANCHOR_GENERATOR, ...) are ignored; a small explicit skip-list
covers run-artifact keys that are machine-specific in the frozen dumps
(OUTPUT_DIR, per-run EXPERIMENT_NAME) — everything else must match exactly.

Used by tests/test_config_reference_parity.py as the regression gate and
runnable standalone for a human-readable report:

    python tools/config_reference_diff.py [--ref /root/reference/configs]
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Any, Dict, List, Tuple

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dafne_tpu.config.config import _load_yaml_with_base, _decode_tree, load_config

REFERENCE_CONFIG_ROOT = "/root/reference/configs"

#: Keys that are run artifacts of the original training machine, not recipe
#: values: the frozen dumps record the absolute results dir and a per-run
#: experiment name.  MODEL.WEIGHTS in the frozen dumps is the ImageNet init
#: (compared normally).
SKIP_KEYS = {
    "OUTPUT_DIR",
    "EXPERIMENT_NAME",
}

#: repo config path -> reference config path (relative to each configs/ root).
#: Identical names throughout; listed explicitly so a missing pairing is loud.
RECIPE_PAIRS = [
    ("dota-1.0/600.yaml", "dota-1.0/600.yaml"),
    ("dota-1.0/1024.yaml", "dota-1.0/1024.yaml"),
    ("dota-1.5/600.yaml", "dota-1.5/600.yaml"),
    ("dota-1.5/1024.yaml", "dota-1.5/1024.yaml"),
    ("hrsc/base.yaml", "hrsc/base.yaml"),
    ("hrsc/base_val.yaml", "hrsc/base_val.yaml"),
    ("icdar15/base.yaml", "icdar15/base.yaml"),
    ("icdar15/r101.yaml", "icdar15/r101.yaml"),
    ("ucas_aod/base.yaml", "ucas_aod/base.yaml"),
    ("ucas_aod/r101.yaml", "ucas_aod/r101.yaml"),
    ("ucas_aod/ablation.yaml", "ucas_aod/ablation.yaml"),
    ("paper/ablation/dota-1.0-base.yaml", "paper/ablation/dota-1.0-base.yaml"),
    ("paper/ablation/dota-1.5-base.yaml", "paper/ablation/dota-1.5-base.yaml"),
    ("paper/ablation/hrsc-base.yaml", "paper/ablation/hrsc-base.yaml"),
    ("pre-trained/dota-1.0_r101_ms.yaml", "pre-trained/dota-1.0_r101_ms.yaml"),
    ("pre-trained/dota-1.5_r101_ms.yaml", "pre-trained/dota-1.5_r101_ms.yaml"),
    ("pre-trained/hrsc_r50_ms.yaml", "pre-trained/hrsc_r50_ms.yaml"),
    ("pre-trained/hrsc_r101_ms.yaml", "pre-trained/hrsc_r101_ms.yaml"),
    ("pre-trained/ucas_aod_r101_ms.yaml", "pre-trained/ucas_aod_r101_ms.yaml"),
]


def _flatten(tree: Any, prefix: str = "") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            key = f"{prefix}.{k}" if prefix else str(k)
            out.update(_flatten(v, key))
    else:
        out[prefix] = tree
    return out


def _norm(v: Any) -> Any:
    """Value normalization: tuples/lists compare equal, int/float compare by
    value (YACS round-trips 5 vs 5.0 freely)."""
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return float(v)
    return v


def diff_recipe(
    repo_cfg_path: str, ref_cfg_path: str
) -> List[Tuple[str, Any, Any]]:
    """Return [(dotted_key, repo_value, ref_value)] for every mismatch among
    keys present in the reference file chain AND the repo schema."""
    repo_cfg = load_config(repo_cfg_path, freeze=False)
    ref_tree = _decode_tree(_load_yaml_with_base(ref_cfg_path))
    ref_flat = _flatten(ref_tree)
    mismatches: List[Tuple[str, Any, Any]] = []
    for key, ref_val in sorted(ref_flat.items()):
        if key in SKIP_KEYS:
            continue
        sentinel = object()
        repo_val = repo_cfg.get_by_path(key, sentinel)
        if repo_val is sentinel:
            continue  # not in repo schema (detectron2-only key)
        if _norm(repo_val) != _norm(ref_val):
            mismatches.append((key, repo_val, ref_val))
    return mismatches


def run_diff(repo_root: str, ref_root: str) -> Dict[str, List[Tuple[str, Any, Any]]]:
    results = {}
    for repo_rel, ref_rel in RECIPE_PAIRS:
        repo_path = os.path.join(repo_root, repo_rel)
        ref_path = os.path.join(ref_root, ref_rel)
        results[repo_rel] = diff_recipe(repo_path, ref_path)
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default=REFERENCE_CONFIG_ROOT)
    ap.add_argument(
        "--repo", default=os.path.join(os.path.dirname(__file__), "..", "configs")
    )
    args = ap.parse_args()
    results = run_diff(args.repo, args.ref)
    n_bad = 0
    for recipe, mismatches in results.items():
        if not mismatches:
            print(f"OK    {recipe}")
            continue
        n_bad += 1
        print(f"DIFF  {recipe}")
        for key, repo_val, ref_val in mismatches:
            print(f"      {key}: repo={repo_val!r}  ref={ref_val!r}")
    print(f"\n{len(results) - n_bad}/{len(results)} recipes value-exact")
    raise SystemExit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
