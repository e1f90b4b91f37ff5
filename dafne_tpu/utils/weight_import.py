"""Torch/Detectron2 checkpoint importer (SURVEY.md §7 hard part #7).

Converts the reference's weights into this framework's flax param tree:

- Detectron2 ImageNet backbone pickles (`R-50.pkl`: numpy arrays keyed
  `stem.conv1.weight`, `res2.0.conv1.norm.running_mean`, ...)
- full DAFNe training checkpoints (`model_*.pth`: torch tensors keyed
  `backbone.bottom_up.stem...`, `backbone.fpn_lateral3...`,
  `proposal_generator.dafne_head.cls_tower.0.weight`, ...)

Conv kernels transpose NCHW->HWIO; FrozenBN/GN stats and affines map by
name.  Unmatched reference keys and unfilled target leaves are reported so
parity gaps are visible instead of silent.
"""

from __future__ import annotations

import dataclasses
import logging
import math
import pickle
import re
from typing import Any, Dict, List, Optional, Set, Tuple

import numpy as np

logger = logging.getLogger("dafne_tpu")


@dataclasses.dataclass
class ImportReport:
    """Outcome of a checkpoint import: which reference tensors were consumed
    and which target leaves were filled.  The parity gate requires
    `unmatched == []` and `unfilled == []` for a full DAFNe checkpoint."""

    used: List[str] = dataclasses.field(default_factory=list)
    unmatched: List[str] = dataclasses.field(default_factory=list)
    filled: Set[tuple] = dataclasses.field(default_factory=set)
    target_paths: Set[tuple] = dataclasses.field(default_factory=set)

    @property
    def unfilled(self) -> List[tuple]:
        return sorted(self.target_paths - self.filled)


_C2_STAGE = {"branch2a": "conv1", "branch2b": "conv2", "branch2c": "conv3",
             "branch1": "shortcut"}


def convert_c2_names(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Convert Caffe2-style MSRA ImageNet pickles (the actual layout of
    `detectron2://ImageNetPretrained/MSRA/R-50.pkl`: `conv1_w`,
    `res_conv1_bn_s`, `res2_0_branch2a_w`, ...) to Detectron2 module names,
    mirroring d2's `convert_basic_c2_names` for the ResNet subset."""
    out = {}
    for k, v in sd.items():
        if k.startswith("fc1000") or k.startswith("pred_"):
            continue  # classifier head, not used by detection
        if k == "conv1_w":
            out["stem.conv1.weight"] = v
        elif k in ("res_conv1_bn_s", "conv1_bn_s"):
            out["stem.conv1.norm.weight"] = v
        elif k in ("res_conv1_bn_b", "conv1_bn_b"):
            out["stem.conv1.norm.bias"] = v
        else:
            m = re.match(r"res(\d)_(\d+)_(branch\w+)_(w|bn_s|bn_b)$", k)
            if not m:
                out[k] = v
                continue
            conv = _C2_STAGE.get(m[3])
            if conv is None:
                out[k] = v
                continue
            suffix = {"w": "weight", "bn_s": "norm.weight", "bn_b": "norm.bias"}[m[4]]
            out[f"res{m[1]}.{m[2]}.{conv}.{suffix}"] = v
    return out


def _looks_like_c2(sd: Dict[str, np.ndarray]) -> bool:
    return any(re.match(r"res\d_\d+_branch", k) for k in sd) or "conv1_w" in sd


def _load_state_dict(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        sd = data.get("model", data)
    else:
        import torch

        data = torch.load(path, map_location="cpu", weights_only=False)
        sd = data.get("model", data)
        sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return {k: np.asarray(v) for k, v in sd.items() if not k.startswith("pixel_")}


def _strip_prefixes(key: str) -> str:
    for p in ("module.", "backbone.bottom_up.", "bottom_up."):
        if key.startswith(p):
            key = key[len(p):]
    return key


def _tower_strides(sd: Dict[str, np.ndarray]) -> Dict[str, int]:
    """Infer each torch tower Sequential's layout stride from the checkpoint.

    With a norm the reference towers are [conv, norm, relu]*N (convs at
    3i); with NORM='none' they are [conv, relu]*N (convs at 2i,
    dafne.py:310-348).  Conv entries are the 4-D weights, so the gcd of
    their nonzero indices IS the stride; hardcoding 3 mis-mapped no-norm
    checkpoints (convs routed to norm slots and silently dropped).
    """
    conv_idx: Dict[str, set] = {}
    for key, value in sd.items():
        m = re.match(
            r"proposal_generator\.dafne_head\.(\w+)_tower\.(\d+)\.weight$",
            _strip_prefixes(key),
        )
        if m and np.asarray(value).ndim == 4:
            conv_idx.setdefault(m[1], set()).add(int(m[2]))
    strides = {}
    for tower, ixs in conv_idx.items():
        nonzero = sorted(i for i in ixs if i)
        strides[tower] = math.gcd(*nonzero) if nonzero else 3
    return strides


def _map_key(
    key: str, tower_strides: Optional[Dict[str, int]] = None
) -> Optional[Tuple[Tuple[str, ...], str]]:
    """Reference key -> (flax path tuple, kind) where kind in
    {conv_w, b, affine_w, affine_b, mean, var, gn_w, gn_b, scale}."""
    k = _strip_prefixes(key)

    # ----- backbone stem / stages ------------------------------------------
    m = re.match(r"stem\.conv1\.(weight|bias)$", k)
    if m:
        return ("backbone", "stem_conv1", "kernel" if m[1] == "weight" else "bias"), (
            "conv_w" if m[1] == "weight" else "b"
        )
    m = re.match(r"stem\.conv1\.norm\.(\w+)$", k)
    if m:
        return ("backbone", "stem_conv1_norm", m[1]), "affine"
    m = re.match(r"res(\d)\.(\d+)\.(conv\d|shortcut)\.weight$", k)
    if m:
        return ("backbone", f"res{m[1]}_{m[2]}", m[3], "kernel"), "conv_w"
    m = re.match(r"res(\d)\.(\d+)\.(conv\d|shortcut)\.norm\.(\w+)$", k)
    if m:
        return ("backbone", f"res{m[1]}_{m[2]}", f"{m[3]}_norm", m[4]), "affine"

    # ----- FPN ---------------------------------------------------------------
    m = re.match(r"backbone\.fpn_lateral(\d)\.(weight|bias)$", k) or re.match(
        r"fpn_lateral(\d)\.(weight|bias)$", k
    )
    if m:
        return (
            "fpn", f"lateral_res{m[1]}", "kernel" if m[2] == "weight" else "bias"
        ), ("conv_w" if m[2] == "weight" else "b")
    m = re.match(r"backbone\.fpn_output(\d)\.(weight|bias)$", k) or re.match(
        r"fpn_output(\d)\.(weight|bias)$", k
    )
    if m:
        return (
            "fpn", f"output_p{m[1]}", "kernel" if m[2] == "weight" else "bias"
        ), ("conv_w" if m[2] == "weight" else "b")
    m = re.match(r"(?:backbone\.)?top_block\.p(\d)\.(weight|bias)$", k)
    if m:
        return ("fpn", f"p{m[1]}", "kernel" if m[2] == "weight" else "bias"), (
            "conv_w" if m[2] == "weight" else "b"
        )

    # ----- DAFNe head ----------------------------------------------------------
    # BN/SyncBN towers: ModuleListDial (one BatchNorm per FPN level) is an
    # nn.ModuleList, so checkpoint keys are `tower.{3i+1}.{level}.{leaf}`
    # (dafne.py:330-343).  weight/bias -> flax BatchNorm params scale/bias;
    # running stats -> the batch_stats collection (callers merge it in via
    # merge_batch_stats / split_batch_stats).
    m = re.match(
        r"proposal_generator\.dafne_head\.(cls|corners|center|share)_tower\."
        r"(\d+)\.(\d+)\.(weight|bias|running_mean|running_var|num_batches_tracked)$",
        k,
    )
    if m:
        tower, idx, lvl, leaf = m[1], int(m[2]), int(m[3]), m[4]
        if leaf == "num_batches_tracked":
            return ("__ignored__",), "ignore"
        s_ = (tower_strides or {}).get(tower, 3)
        leaf_name = {
            "weight": "scale", "bias": "bias",
            "running_mean": "mean", "running_var": "var",
        }[leaf]
        return (
            "head", f"{tower}_tower", f"norm{idx // s_}_level{lvl}", leaf_name
        ), "b"
    m = re.match(
        r"proposal_generator\.dafne_head\.(cls|corners|center|share)_tower\.(\d+)\.(weight|bias)$",
        k,
    )
    if m:
        tower, idx, wb = m[1], int(m[2]), m[3]
        # torch Sequential: conv at s*i, norm at s*i+1 where s is the
        # tower's layout stride (3 with a norm, 2 for NORM='none')
        s_ = (tower_strides or {}).get(tower, 3)
        if idx % s_ == 0:
            return (
                "head", f"{tower}_tower", f"conv{idx // s_}",
                "kernel" if wb == "weight" else "bias",
            ), ("conv_w" if wb == "weight" else "b")
        return (
            "head", f"{tower}_tower", f"norm{idx // s_}",
            "scale" if wb == "weight" else "bias",
        ), "b"
    m = re.match(
        r"proposal_generator\.dafne_head\.(cls_logits|ctrness|corners_pred|center_pred|xywha_pred|c\d_pred)\.(weight|bias)$",
        k,
    )
    if m:
        return ("head", m[1], "kernel" if m[2] == "weight" else "bias"), (
            "conv_w" if m[2] == "weight" else "b"
        )
    m = re.match(r"proposal_generator\.dafne_head\.scales\.(\d+)\.scale$", k)
    if m:
        return ("head", "scales", int(m[1])), "scale_elem"
    m = re.match(r"top_module\.(weight|bias)$", k)
    if m:
        return ("top_module", "kernel" if m[1] == "weight" else "bias"), (
            "conv_w" if m[1] == "weight" else "b"
        )
    return None


def import_state_dict(
    sd: Dict[str, np.ndarray], params, strict: bool = False
) -> Tuple[Any, ImportReport]:
    """Fill `params` (flax param tree) from a reference state dict.

    Returns (new_params, report).  With strict=True a shape mismatch raises.
    The parity gate checks `report.unmatched == []` and
    `report.unfilled == []` before a real-checkpoint evaluation (a full
    DAFNe checkpoint must fill every leaf; an ImageNet backbone pickle
    legitimately leaves fpn/head at init).
    """
    if _looks_like_c2(sd):
        sd = convert_c2_names(sd)
    tower_strides = _tower_strides(sd)
    flat = _flatten(params)
    report = ImportReport(target_paths=set(flat))
    scales_updates: Dict[int, float] = {}
    for key, value in sd.items():
        mapped = _map_key(key, tower_strides)
        if mapped is None:
            report.unmatched.append(key)
            continue
        path_t, kind = mapped
        if kind == "ignore":  # e.g. BatchNorm num_batches_tracked
            report.used.append(key)
            continue
        if kind == "scale_elem":
            scales_updates[path_t[-1]] = float(np.asarray(value).reshape(()))
            report.used.append(key)
            continue
        if path_t not in flat:
            report.unmatched.append(key)
            continue
        v = np.asarray(value, np.float32)
        if kind == "conv_w":
            v = v.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        target = flat[path_t]
        if v.shape != target.shape:
            msg = f"shape mismatch for {key}: {v.shape} vs {target.shape}"
            if strict:
                raise ValueError(msg)
            logger.warning(msg)
            report.unmatched.append(key)
            continue
        flat[path_t] = v
        report.used.append(key)
        report.filled.add(path_t)

    if scales_updates:
        spath = ("head", "scales")
        if spath in flat:
            s = np.array(flat[spath])
            for i, val in scales_updates.items():
                s[i] = val
            flat[spath] = s
            report.filled.add(spath)

    logger.info(
        f"weight import: {len(report.used)}/{len(sd)} reference tensors used, "
        f"{len(report.unmatched)} unmatched, {len(report.unfilled)} target "
        f"leaves unfilled"
    )
    if report.unmatched[:10]:
        logger.info(f"first unmatched: {report.unmatched[:10]}")
    return _unflatten(flat, params), report


def merge_batch_stats(params, batch_stats):
    """Deep-merge the flax `batch_stats` collection into a copy of `params`.

    BN-recipe checkpoints (head NORM: BN/SyncBN) carry running stats for the
    per-level BatchNorms (ModuleListDial, dafne.py:330-343); flax keeps
    those in a separate `batch_stats` collection whose tree mirrors the
    params tree with leaves `mean`/`var`.  Merging lets import_state_dict
    fill both in one pass; split back with split_batch_stats.
    """
    if batch_stats is None:
        return params
    if not isinstance(params, dict):
        return params
    out = dict(params)
    for k, v in batch_stats.items():
        if k in out and isinstance(out[k], dict):
            out[k] = merge_batch_stats(out[k], v)
        else:
            out[k] = v
    return out


def split_batch_stats(merged):
    """Inverse of merge_batch_stats: pull leaves named `mean`/`var` (flax
    BatchNorm running stats) into a separate batch_stats tree.  Returns
    (params, batch_stats) with batch_stats None when no BN stats exist.
    FrozenBN stats are params named running_mean/running_var, so they are
    unaffected."""

    def walk(tree):
        params, stats = {}, {}
        for k, v in tree.items():
            if isinstance(v, dict):
                p, s = walk(v)
                if p:
                    params[k] = p
                if s:
                    stats[k] = s
            elif k in ("mean", "var"):
                stats[k] = v
            else:
                params[k] = v
        return params, stats

    params, stats = walk(merged)
    return params, (stats or None)


def load_reference_weights(path: str, params, strict: bool = False):
    """Fill `params` (flax param tree) from a reference checkpoint file."""
    sd = _load_state_dict(path)
    new_params, _ = import_state_dict(sd, params, strict=strict)
    return new_params


def _flatten(tree, prefix=()) -> Dict[tuple, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[tuple, np.ndarray], template):
    import jax.numpy as jnp

    def build(tree, prefix=()):
        if isinstance(tree, dict):
            return {k: build(v, prefix + (k,)) for k, v in tree.items()}
        return jnp.asarray(flat[prefix])

    return build(template)
