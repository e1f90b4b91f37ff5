"""Cross-tile result merging for DOTA test submissions.

Behavioral equivalent of dafne/utils/ResultMerge_multi_process.py:
- tile ids follow "name__rate__x___y" (parse: ResultMerge:194-203)
- detections are shifted back by the tile origin and rescaled by 1/rate
  (ResultMerge:174-181)
- per original image, per class: greedy rotated poly-NMS at `nms_thresh`
  (default 0.1) with an hbb prefilter (py_cpu_nms_poly_fast, :61-122) —
  here the native C++ `poly_nms`
- NaN rows dropped like the reference's guard (:48-52)
- multiprocessing across classes (the reference uses a 16-proc pool;
  classes are embarrassingly parallel)

Input/output are DOTA Task1 per-class files, or the in-memory dict API.
"""

from __future__ import annotations

import os
import re
import zipfile
from concurrent.futures import ProcessPoolExecutor
from typing import Dict, List, Optional, Tuple

import numpy as np

from dafne_tpu.utils.polyiou import poly_nms

_TILE_RE = re.compile(r"^(.*?)__([\d.]+)__(\d+)___(\d+)$")


def parse_tile_id(tile_id: str) -> Tuple[str, float, float, float]:
    """'P0003__1__0___600' -> ('P0003', 1.0, 0.0, 600.0); plain ids pass
    through with rate 1 and zero offset."""
    m = _TILE_RE.match(tile_id)
    if not m:
        return tile_id, 1.0, 0.0, 0.0
    return m[1], float(m[2]), float(m[3]), float(m[4])


def merge_class_lines(lines: List[str], nms_thresh: float) -> List[str]:
    """Merge one class's Task1 lines across tiles into original frames."""
    by_image: Dict[str, List[Tuple[float, np.ndarray]]] = {}
    for line in lines:
        parts = line.split()
        if len(parts) < 10:
            continue
        tile_id, score = parts[0], float(parts[1])
        poly = np.asarray([float(v) for v in parts[2:10]])
        if not np.isfinite(poly).all():
            continue  # NaN guard (ResultMerge:48-52)
        name, rate, ox, oy = parse_tile_id(tile_id)
        poly = (poly.reshape(4, 2) + [ox, oy]).reshape(8) / rate
        by_image.setdefault(name, []).append((score, poly))

    out = []
    for name, dets in by_image.items():
        scores = np.asarray([d[0] for d in dets])
        polys = np.stack([d[1] for d in dets])
        keep = poly_nms(polys, scores, nms_thresh)
        for i in np.where(keep)[0]:
            coords = " ".join(f"{v:.2f}" for v in polys[i])
            out.append(f"{name} {scores[i]:.4f} {coords}")
    return out


def _merge_one_file(args):
    src, dst, nms_thresh = args
    with open(src) as f:
        lines = [l.strip() for l in f if l.strip()]
    merged = merge_class_lines(lines, nms_thresh)
    with open(dst, "w") as f:
        f.write("\n".join(merged) + ("\n" if merged else ""))
    return dst


def merge_by_poly(
    src_dir: str,
    dst_dir: str,
    nms_thresh: float = 0.1,
    num_workers: int = 8,
) -> List[str]:
    """Merge every Task1_*.txt in src_dir into dst_dir (mergebypoly,
    ResultMerge:249-262)."""
    os.makedirs(dst_dir, exist_ok=True)
    jobs = []
    for fn in sorted(os.listdir(src_dir)):
        if fn.startswith("Task1_") and fn.endswith(".txt"):
            jobs.append(
                (os.path.join(src_dir, fn), os.path.join(dst_dir, fn), nms_thresh)
            )
    if num_workers > 1 and len(jobs) > 1:
        with ProcessPoolExecutor(min(num_workers, len(jobs))) as ex:
            return list(ex.map(_merge_one_file, jobs))
    return [_merge_one_file(j) for j in jobs]


def make_submission_zip(merged_dir: str, zip_path: str) -> str:
    """Zip merged Task1 files for the DOTA evaluation server
    (dota_evaluation.py:344-351)."""
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        for fn in sorted(os.listdir(merged_dir)):
            if fn.startswith("Task1_") and fn.endswith(".txt"):
                z.write(os.path.join(merged_dir, fn), fn)
    return zip_path
