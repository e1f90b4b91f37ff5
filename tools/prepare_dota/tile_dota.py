"""Offline DOTA tiling: gigapixel scenes -> fixed-size training tiles.

Behavioral equivalent of the reference's DOTA_devkit-derived pipeline
(tools/prepare_dota/ImgSplit_multi_process.py, SplitOnlyImage_multi_process.py)
without the shapely/GEOS dependency — polygon∩tile intersection is a small
Sutherland-Hodgman clip in NumPy:

- sliding window of `subsize` with stride `subsize - gap`, last window
  snapped to the image edge; edge tiles zero-padded to subsize
- per-tile label rewrite: fully-contained polys kept verbatim; partially
  cut polys replaced by their intersection polygon, 5-gons reduced to
  4-gons by merging the endpoints of the shortest edge
  (GetPoly4FromPoly5, ImgSplit:125-145), >5-gons dropped; vertex order
  re-anchored to best match the original poly
  (choose_best_pointorder_fit_another, ImgSplit:18-35); coordinates clamped
  to [1, subsize]; objects with intersection ratio <= `thresh` (0.7)
  re-tagged difficult="2" (ImgSplit:200-204)
- multiprocess pool across images
"""

from __future__ import annotations

import os
from concurrent.futures import ProcessPoolExecutor
from typing import List, Optional, Tuple

import numpy as np


# --------------------------------------------------------------------------
# DOTA label txt io
# --------------------------------------------------------------------------


def parse_dota_label(path: str) -> List[dict]:
    """Parse labelTxt lines: 'x0 y0 x1 y1 x2 y2 x3 y3 name difficult'."""
    objs = []
    if not os.path.exists(path):
        return objs
    with open(path, encoding="utf-8-sig") as f:
        for line in f:
            parts = line.split()
            if len(parts) < 9:
                continue  # header lines (imagesource / gsd)
            try:
                poly = [float(v) for v in parts[:8]]
            except ValueError:
                continue
            name = parts[8]
            difficult = parts[9] if len(parts) > 9 else "0"
            objs.append({"poly": poly, "name": name, "difficult": difficult})
    return objs


def write_dota_label(path: str, objs: List[dict]) -> None:
    with open(path, "w") as f:
        for o in objs:
            coords = " ".join(str(v) for v in o["poly"])
            f.write(f"{coords} {o['name']} {o['difficult']}\n")


# --------------------------------------------------------------------------
# polygon math (NumPy, no shapely)
# --------------------------------------------------------------------------


def polygon_area(poly: np.ndarray) -> float:
    x, y = poly[0::2], poly[1::2]
    return 0.5 * abs(
        float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
    )


def clip_polygon_to_rect(
    poly: np.ndarray, left: float, up: float, right: float, down: float
) -> np.ndarray:
    """Sutherland-Hodgman clip of a polygon [N, 2] to an axis-aligned rect.
    Returns [M, 2] (possibly empty), CCW-oriented in image coords."""
    pts = poly.reshape(-1, 2).astype(np.float64)

    def clip(pts, inside, intersect):
        out = []
        n = len(pts)
        for i in range(n):
            cur, nxt = pts[i], pts[(i + 1) % n]
            if inside(cur):
                out.append(cur)
                if not inside(nxt):
                    out.append(intersect(cur, nxt))
            elif inside(nxt):
                out.append(intersect(cur, nxt))
        return np.asarray(out)

    def x_cut(a, b, x):
        t = (x - a[0]) / (b[0] - a[0])
        return np.asarray([x, a[1] + t * (b[1] - a[1])])

    def y_cut(a, b, y):
        t = (y - a[1]) / (b[1] - a[1])
        return np.asarray([a[0] + t * (b[0] - a[0]), y])

    for inside, intersect in [
        (lambda p: p[0] >= left, lambda a, b: x_cut(a, b, left)),
        (lambda p: p[0] <= right, lambda a, b: x_cut(a, b, right)),
        (lambda p: p[1] >= up, lambda a, b: y_cut(a, b, up)),
        (lambda p: p[1] <= down, lambda a, b: y_cut(a, b, down)),
    ]:
        if len(pts) == 0:
            return pts.reshape(0, 2)
        pts = clip(pts, inside, intersect)

    # drop duplicate consecutive vertices
    if len(pts):
        keep = [0]
        for i in range(1, len(pts)):
            if not np.allclose(pts[i], pts[keep[-1]], atol=1e-9):
                keep.append(i)
        if len(keep) > 1 and np.allclose(pts[keep[-1]], pts[keep[0]], atol=1e-9):
            keep = keep[:-1]
        pts = pts[keep]
    return pts.reshape(-1, 2)


def poly5_to_poly4(poly: List[float]) -> List[float]:
    """Reduce a 5-gon to a 4-gon by replacing the shortest edge's endpoints
    with their midpoint (GetPoly4FromPoly5 semantics, ImgSplit:125-145)."""
    p = np.asarray(poly, np.float64).reshape(5, 2)
    edge_len = np.linalg.norm(p - np.roll(p, -1, axis=0), axis=1)
    k = int(np.argmin(edge_len))
    mid = (p[k] + p[(k + 1) % 5]) / 2
    out = [p[i] for i in range(5) if i not in (k, (k + 1) % 5)]
    out.insert(k if k < (k + 1) % 5 else 0, mid)
    return np.asarray(out).reshape(-1).tolist()


def best_point_order(poly: np.ndarray, ref: np.ndarray) -> np.ndarray:
    """Cyclic shift of `poly` [8] minimizing summed vertex distance to
    `ref` [8] (choose_best_pointorder_fit_another, ImgSplit:18-35)."""
    p = poly.reshape(4, 2)
    best, best_d = poly, np.inf
    for s in range(4):
        cand = np.roll(p, -s, axis=0).reshape(8)
        d = float(np.abs(cand - ref).sum())
        if d < best_d:
            best, best_d = cand, d
    return best


# --------------------------------------------------------------------------
# tiling
# --------------------------------------------------------------------------


def tile_origins(size: int, subsize: int, slide: int) -> List[int]:
    """Sliding-window origins with the last window snapped to the edge."""
    out = []
    pos = 0
    while True:
        if pos + subsize >= size:
            out.append(max(size - subsize, 0))
            break
        out.append(pos)
        pos += slide
    return out


def rewrite_labels_for_tile(
    objects: List[dict],
    left: int,
    up: int,
    subsize: int,
    thresh: float = 0.7,
    choose_best_point: bool = True,
) -> List[dict]:
    out = []
    right, down = left + subsize, up + subsize
    for obj in objects:
        poly = np.asarray(obj["poly"], np.float64)
        area = polygon_area(poly)
        if area <= 0:
            continue
        inter = clip_polygon_to_rect(poly, left, up, right, down)
        if len(inter) < 3:
            continue
        inter_area = polygon_area(inter.reshape(-1))
        ratio = inter_area / area
        if ratio >= 1.0 - 1e-9:
            new_poly = poly.copy()
            difficult = obj["difficult"]
        else:
            if ratio <= 0:
                continue
            flat = inter.reshape(-1).tolist()
            if len(inter) == 4:
                new_poly = np.asarray(flat)
            elif len(inter) == 5:
                new_poly = np.asarray(poly5_to_poly4(flat))
            else:
                continue  # >5-gon: unhandled, like the reference
            if choose_best_point:
                new_poly = best_point_order(new_poly, poly)
            difficult = obj["difficult"] if ratio > thresh else "2"
        shifted = new_poly.reshape(4, 2) - [left, up]
        shifted = np.clip(np.rint(shifted), 1, subsize)
        out.append(
            {
                "poly": [int(v) for v in shifted.reshape(-1)],
                "name": obj["name"],
                "difficult": difficult,
            }
        )
    return out


def _split_one(args):
    (name, image_dir, label_dir, out_image_dir, out_label_dir, subsize, gap,
     rate, ext, padding, thresh) = args
    import cv2

    img = cv2.imread(os.path.join(image_dir, name + ext))
    if img is None:
        return 0
    objects = parse_dota_label(os.path.join(label_dir, name + ".txt")) if label_dir else []
    if rate != 1:
        img = cv2.resize(img, None, fx=rate, fy=rate, interpolation=cv2.INTER_CUBIC)
        for o in objects:
            o["poly"] = [v * rate for v in o["poly"]]
    h, w = img.shape[:2]
    slide = subsize - gap
    n = 0
    for left in tile_origins(w, subsize, slide):
        for up in tile_origins(h, subsize, slide):
            tile_name = f"{name}__{rate}__{left}___{up}"
            sub = img[up : up + subsize, left : left + subsize]
            if padding and (sub.shape[0] < subsize or sub.shape[1] < subsize):
                canvas = np.zeros((subsize, subsize, 3), img.dtype)
                canvas[: sub.shape[0], : sub.shape[1]] = sub
                sub = canvas
            cv2.imwrite(os.path.join(out_image_dir, tile_name + ".png"), sub)
            if out_label_dir is not None:
                labels = rewrite_labels_for_tile(
                    objects, left, up, subsize, thresh
                )
                write_dota_label(
                    os.path.join(out_label_dir, tile_name + ".txt"), labels
                )
            n += 1
    return n


class TileSplitter:
    """Split a DOTA split dir ({images,labelTxt}) into tiles.

    labeled=False gives the image-only test splitter
    (SplitOnlyImage_multi_process.py equivalent)."""

    def __init__(
        self,
        src: str,
        dst: str,
        subsize: int = 1024,
        gap: int = 200,
        num_workers: int = 16,
        ext: str = ".png",
        padding: bool = True,
        thresh: float = 0.7,
        labeled: bool = True,
    ):
        if gap >= subsize:
            raise ValueError(
                f"overlap/gap ({gap}) must be < patch size ({subsize}): "
                "the sliding window would never advance"
            )
        self.image_dir = os.path.join(src, "images")
        self.label_dir = os.path.join(src, "labelTxt") if labeled else None
        self.out_image_dir = os.path.join(dst, "images")
        self.out_label_dir = os.path.join(dst, "labelTxt") if labeled else None
        os.makedirs(self.out_image_dir, exist_ok=True)
        if self.out_label_dir:
            os.makedirs(self.out_label_dir, exist_ok=True)
        self.subsize, self.gap = subsize, gap
        self.num_workers = num_workers
        self.ext, self.padding, self.thresh = ext, padding, thresh

    def split(self, rate: float = 1.0) -> int:
        names = sorted(
            os.path.splitext(f)[0]
            for f in os.listdir(self.image_dir)
            if f.endswith(self.ext) and not f.startswith("Thumbs")
        )
        jobs = [
            (n, self.image_dir, self.label_dir, self.out_image_dir,
             self.out_label_dir, self.subsize, self.gap, rate, self.ext,
             self.padding, self.thresh)
            for n in names
        ]
        if self.num_workers > 1 and len(jobs) > 1:
            with ProcessPoolExecutor(self.num_workers) as ex:
                return sum(ex.map(_split_one, jobs))
        return sum(_split_one(j) for j in jobs)
