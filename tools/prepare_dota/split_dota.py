#!/usr/bin/env python3
"""CLI: raw DOTA -> train{P}/val{P}/test{P} tile dirs + COCO jsons.

Equivalent of the reference driver (tools/prepare_dota/split_dota.py:82-202):

  python tools/prepare_dota/split_dota.py --source /data/dota_1 \
      --dest /data/dota_1_split --patch-size 1024 --overlap 200 [--version 1.5]
"""

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from tools.prepare_dota.dota_to_coco import (
    DOTA10_CLASSES,
    DOTA15_CLASSES,
    dota_to_coco_test,
    dota_to_coco_train,
)
from tools.prepare_dota.tile_dota import TileSplitter


def prepare(source, dest, patch_size=1024, overlap=200, version="1", workers=16):
    classes = DOTA10_CLASSES if version == "1" else DOTA15_CLASSES
    vtag = version.replace(".", "_").replace("_0", "")
    os.makedirs(dest, exist_ok=True)

    for split in ("train", "val"):
        src = os.path.join(source, split)
        assert os.path.isdir(src), (
            f"'{src}' missing — download/extract DOTA to '{source}' first"
        )
        out = os.path.join(dest, f"{split}{patch_size}")
        n = TileSplitter(
            src, out, subsize=patch_size, gap=overlap, num_workers=workers
        ).split(rate=1)
        print(f"{split}: wrote {n} tiles")
        dota_to_coco_train(
            out,
            os.path.join(out, f"DOTA{vtag}_{split}{patch_size}.json"),
            classes,
            difficult_filter="-1",
        )

    test_src = os.path.join(source, "test")
    if os.path.isdir(os.path.join(test_src, "images")):
        out = os.path.join(dest, f"test{patch_size}")
        n = TileSplitter(
            test_src, out, subsize=patch_size, gap=overlap,
            num_workers=workers, labeled=False,
        ).split(rate=1)
        print(f"test: wrote {n} tiles")
        dota_to_coco_test(
            out, os.path.join(out, f"DOTA{vtag}_test{patch_size}.json"), classes
        )


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", required=True)
    p.add_argument("--dest", required=True)
    p.add_argument("--patch-size", type=int, default=1024)
    p.add_argument("--overlap", type=int, default=200)
    p.add_argument("--version", default="1", choices=["1", "1.5"])
    p.add_argument("--workers", type=int, default=16)
    a = p.parse_args()
    prepare(a.source, a.dest, a.patch_size, a.overlap, a.version, a.workers)
