"""Create an LMDB dataset from an image folder (ref
codes/scripts/create_lmdb.py), using the dependency-free writer in
trainner_tpu/data/lmdb_io.py — no liblmdb needed.

Usage:
  python scripts/create_lmdb.py <image_folder> <out.lmdb> [--level 1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import cv2

    from trainner_tpu.data.common import scan_images
    from trainner_tpu.data.lmdb_io import write_lmdb

    p = argparse.ArgumentParser()
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--level", type=int, default=1,
                   help="PNG compression level (ref compress_level)")
    args = p.parse_args()
    if not args.dst.endswith(".lmdb"):
        args.dst += ".lmdb"

    paths = scan_images(args.src)
    if not paths:
        raise SystemExit(f"no images under {args.src}")
    items = {}
    meta_lines = []
    for path in paths:
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            print(f"skip unreadable {path}")
            continue
        key = os.path.splitext(os.path.basename(path))[0]
        ok, enc = cv2.imencode(
            ".png", img, [cv2.IMWRITE_PNG_COMPRESSION, args.level])
        if not ok:
            print(f"skip unencodable {path}")
            continue
        items[key.encode("ascii")] = enc.tobytes()
        h, w = img.shape[:2]
        c = img.shape[2] if img.ndim == 3 else 1
        meta_lines.append(f"{key}.png ({h},{w},{c}) {args.level}")

    write_lmdb(args.dst, items)
    with open(os.path.join(args.dst, "meta_info.txt"), "w") as f:
        f.write("\n".join(meta_lines) + "\n")
    print(f"wrote {len(items)} images -> {args.dst}")


if __name__ == "__main__":
    main()
