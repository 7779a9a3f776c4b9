"""Batch-convert an image folder to its luma (Y) channel.

Equivalent of ref codes/scripts/color2gray.py: reads every image under
`input`, extracts the ITU-R BT.601 Y channel (same matrix as
trainner_tpu.data.common.rgb2ycbcr / the reference's bgr2ycbcr) and
writes grayscale PNGs, parallelized over a process pool.

Usage:
  python scripts/color2gray.py <input_dir> <save_dir> [--workers N]
"""

from __future__ import annotations

import argparse
import os
import sys
from multiprocessing import Pool

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp", ".tif", ".tiff")


def _worker(job):
    src, dst = job
    import cv2
    import numpy as np

    from trainner_tpu.data.common import rgb2ycbcr

    img = cv2.imread(src, cv2.IMREAD_COLOR)
    if img is None:
        return f"skip (unreadable): {src}"
    y = rgb2ycbcr(img[..., ::-1].astype(np.float32) / 255.0, only_y=True)
    cv2.imwrite(dst, np.clip(y * 255.0 + 0.5, 0, 255).astype(np.uint8))
    return os.path.basename(dst)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("input")
    p.add_argument("save")
    p.add_argument("--workers", type=int, default=8)
    args = p.parse_args()
    os.makedirs(args.save, exist_ok=True)

    jobs = []
    for fname in sorted(os.listdir(args.input)):
        if fname.lower().endswith(EXTS):
            base = os.path.splitext(fname)[0] + ".png"
            jobs.append((os.path.join(args.input, fname),
                         os.path.join(args.save, base)))
    if not jobs:
        raise SystemExit(f"no images in {args.input}")
    if args.workers <= 1:
        for job in jobs:
            print(_worker(job))
    else:
        with Pool(args.workers) as pool:
            for msg in pool.imap_unordered(_worker, jobs):
                print(msg)
    print(f"done: {len(jobs)} images -> {args.save}")


if __name__ == "__main__":
    main()
