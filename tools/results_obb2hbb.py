#!/usr/bin/env python3
"""Convert oriented (Task1) detection files to horizontal (Task2) format.

Equivalent of the devkit's results_obb2hbb.py: each "img score x0 y0 ... y3"
line becomes "img score xmin ymin xmax ymax".

  python tools/results_obb2hbb.py --src task1_dir --dst task2_dir
"""

import argparse
import os


def convert_file(src: str, dst: str) -> int:
    n = 0
    with open(src) as f, open(dst, "w") as out:
        for line in f:
            parts = line.split()
            if len(parts) < 10:
                continue
            xs = [float(v) for v in parts[2:10:2]]
            ys = [float(v) for v in parts[3:10:2]]
            out.write(
                f"{parts[0]} {parts[1]} {min(xs):.2f} {min(ys):.2f} "
                f"{max(xs):.2f} {max(ys):.2f}\n"
            )
            n += 1
    return n


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    args = p.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    for fn in sorted(os.listdir(args.src)):
        if fn.startswith("Task1_") and fn.endswith(".txt"):
            out_name = fn.replace("Task1_", "Task2_")
            n = convert_file(
                os.path.join(args.src, fn), os.path.join(args.dst, out_name)
            )
            print(f"{fn} -> {out_name} ({n} detections)")


if __name__ == "__main__":
    main()
