"""Dataset registry: name -> (loader fn, metadata).

The lightweight equivalent of Detectron2's DatasetCatalog/MetadataCatalog
used by the reference (dafne/data/datasets/dota.py:362-412 et al.).
Records are plain dicts:

  {"file_name": str, "image_id": str, "height": int, "width": int,
   "annotations": [{"corners": [8 floats], "bbox": [x0,y0,x1,y1],
                    "category_id": int, "difficult": bool, "area": float}]}

Data root comes from the DAFNE_DATA_DIR env var (dota.py:391).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional


class _Catalog:
    def __init__(self):
        self._loaders: Dict[str, Callable[[], List[dict]]] = {}

    def register(self, name: str, fn: Callable[[], List[dict]]):
        self._loaders[name] = fn

    def get(self, name: str) -> List[dict]:
        if name not in self._loaders:
            raise KeyError(
                f"Dataset '{name}' is not registered. Known: {sorted(self._loaders)[:20]}..."
            )
        return self._loaders[name]()

    def __contains__(self, name):
        return name in self._loaders

    def list(self):
        return sorted(self._loaders)


DatasetCatalog = _Catalog()
MetadataCatalog: Dict[str, dict] = {}


def data_root() -> str:
    return os.environ.get("DAFNE_DATA_DIR", "/data")


def apply_overfit(records: List[dict], cfg) -> List[dict]:
    """DEBUG.OVERFIT_NUM_IMAGES truncation (defaults.py:13-14, dota.py:128-130)."""
    n = cfg.DEBUG.OVERFIT_NUM_IMAGES
    if n is not None and n > 0:
        return records[:n]
    return records


def get_dataset(name: str, cfg=None) -> List[dict]:
    records = DatasetCatalog.get(name)
    if cfg is not None:
        records = apply_overfit(records, cfg)
    return records


def register_all_datasets(cfg) -> None:
    """Register every dataset family (idempotent), mirroring the reference's
    per-family register_* calls in tools/plain_train_net.py:568-571."""
    from dafne_tpu.data.datasets import dota, hrsc2016, icdar15, synthetic, ucas_aod

    dota.register_dota(cfg)
    hrsc2016.register_hrsc(cfg)
    ucas_aod.register_ucas_aod(cfg)
    icdar15.register_icdar15(cfg)
    synthetic.register_synthetic(cfg)
