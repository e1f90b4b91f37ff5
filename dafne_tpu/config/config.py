"""Minimal YACS-style hierarchical config system.

Replaces the reference's Detectron2/YACS stack (dafne/config/config.py:4-13)
without the Detectron2 dependency, while keeping the public contract:

  - dotted hierarchical keys with attribute access (cfg.MODEL.DAFNE.NUM_CLASSES)
  - YAML config files with ``_BASE_`` inheritance
    (configs/dota-1.0/1024.yaml:1 style)
  - CLI overrides via ``merge_from_list(["KEY.SUBKEY", "value", ...])``
  - freezing after setup

Key names are kept identical to the reference so its shipped YAML recipes
port 1:1 (SURVEY.md §7 design mapping).
"""

from __future__ import annotations

import ast
import copy
import os
from typing import Any, Dict, List

import yaml


class CfgNode(dict):
    """A dict with attribute access, freezing, and recursive merge."""

    _FROZEN_KEY = "__frozen__"

    def __init__(self, init: Dict[str, Any] | None = None):
        super().__init__()
        object.__setattr__(self, "_frozen", False)
        if init:
            for k, v in init.items():
                self[k] = CfgNode(v) if isinstance(v, dict) else v

    # -- attribute protocol -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __setitem__(self, name: str, value: Any) -> None:
        if object.__getattribute__(self, "_frozen"):
            raise AttributeError(
                f"CfgNode is frozen; cannot set {name!r}"
            )
        if isinstance(value, dict) and not isinstance(value, CfgNode):
            value = CfgNode(value)
        super().__setitem__(name, value)

    # -- pickling (dict-subclass pickling bypasses __init__, losing _frozen;
    # grain/multiprocessing workers need round-trippable configs) -----------
    def __reduce__(self):
        return (_rebuild_cfg, (self.to_dict(), self.is_frozen()))

    # -- freezing ------------------------------------------------------------
    def freeze(self) -> "CfgNode":
        object.__setattr__(self, "_frozen", True)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.freeze()
        return self

    def defrost(self) -> "CfgNode":
        object.__setattr__(self, "_frozen", False)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.defrost()
        return self

    def is_frozen(self) -> bool:
        return object.__getattribute__(self, "_frozen")

    # -- cloning / merging ----------------------------------------------------
    def clone(self) -> "CfgNode":
        node = CfgNode()
        for k, v in self.items():
            node[k] = v.clone() if isinstance(v, CfgNode) else copy.deepcopy(v)
        return node

    def merge_from_other(self, other: "CfgNode | Dict[str, Any]") -> None:
        for k, v in other.items():
            if (
                k in self
                and isinstance(self[k], CfgNode)
                and isinstance(v, dict)
            ):
                self[k].merge_from_other(v)
            else:
                self[k] = (
                    CfgNode(v) if isinstance(v, dict) and not isinstance(v, CfgNode) else v
                )

    def merge_from_file(self, filename: str, allow_unsafe: bool = True) -> None:
        """Merge a YAML file, honoring ``_BASE_`` inheritance chains.

        String leaves that parse as Python literals (e.g. the YACS-style
        ``("dota_1_train_600",)`` tuples in the reference configs) are
        decoded, matching YACS ``_decode_cfg_value`` behavior.
        """
        merged = _decode_tree(_load_yaml_with_base(filename))
        self.merge_from_other(merged)

    def merge_from_list(self, opts: List[Any]) -> None:
        """Merge dotted KEY VALUE pairs (the CLI override contract,
        plain_train_net.py:527)."""
        assert len(opts) % 2 == 0, f"Override list must be key-value pairs: {opts}"
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                if p not in node:
                    node[p] = CfgNode()
                node = node[p]
            node[parts[-1]] = _decode_value(value, node.get(parts[-1]))

    # -- dotted access ---------------------------------------------------------
    def get_by_path(self, dotted: str, default: Any = None) -> Any:
        node: Any = self
        for p in dotted.split("."):
            if not isinstance(node, dict) or p not in node:
                return default
            node = node[p]
        return node

    def to_dict(self) -> Dict[str, Any]:
        return {
            k: (v.to_dict() if isinstance(v, CfgNode) else v)
            for k, v in self.items()
        }

    def dump(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=True)

    def dump_to_file(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.dump())


def _rebuild_cfg(data: Dict[str, Any], frozen: bool) -> "CfgNode":
    node = CfgNode(data)
    if frozen:
        node.freeze()
    return node


def _decode_value(value: Any, old: Any) -> Any:
    """Parse a CLI string into a Python literal, coerced toward old's type."""
    if not isinstance(value, str):
        return value
    try:
        parsed = ast.literal_eval(value)
    except (ValueError, SyntaxError):
        parsed = value
    if old is not None and isinstance(old, bool) and isinstance(parsed, str):
        low = parsed.lower()
        if low in ("true", "false"):
            parsed = low == "true"
    if old is not None and isinstance(old, float) and isinstance(parsed, int):
        parsed = float(parsed)
    if isinstance(parsed, tuple):
        parsed = list(parsed)
    return parsed


def _decode_tree(tree: Any) -> Any:
    if isinstance(tree, dict):
        return {k: _decode_tree(v) for k, v in tree.items()}
    return _decode_value(tree, None)


def _load_yaml_with_base(filename: str) -> Dict[str, Any]:
    with open(filename, "r") as f:
        loaded = yaml.safe_load(f) or {}
    base_key = "_BASE_"
    if base_key in loaded:
        base_file = loaded.pop(base_key)
        if not os.path.isabs(base_file):
            base_file = os.path.join(os.path.dirname(filename), base_file)
        merged = _load_yaml_with_base(base_file)
        _deep_update(merged, loaded)
        return merged
    return loaded


def _deep_update(dst: Dict[str, Any], src: Dict[str, Any]) -> None:
    for k, v in src.items():
        if k in dst and isinstance(dst[k], dict) and isinstance(v, dict):
            _deep_update(dst[k], v)
        else:
            dst[k] = v


def get_cfg() -> CfgNode:
    """Fresh copy of the full default config (dafne/config/config.py:4-13)."""
    from dafne_tpu.config.defaults import build_defaults

    return build_defaults()


def load_config(
    config_file: str | None = None, opts: List[Any] | None = None, freeze: bool = True
) -> CfgNode:
    """get_cfg -> merge_from_file -> merge_from_list -> freeze, i.e. the
    `setup()` flow of tools/plain_train_net.py:521-544."""
    cfg = get_cfg()
    if config_file:
        cfg.merge_from_file(config_file)
    if opts:
        cfg.merge_from_list(list(opts))
    if freeze:
        cfg.freeze()
    return cfg
