"""Crop a patch from each image, enlarge it, and draw the source rect.

Equivalent of ref codes/scripts/extract_enlarge_patches.py (paper-figure
helper): for every image matching the glob, write `<name>_patch.png`
(the crop, nearest-enlarged) and `<name>_rect.png` (the original with
the crop rectangle drawn on it).

Usage:
  python scripts/extract_enlarge_patches.py 'results/*.png' out_dir \
      --rect 170 232 64 100 --ratio 3 --color yellow
"""

from __future__ import annotations

import argparse
import glob
import os

COLORS = {"yellow": (0, 255, 255), "green": (0, 255, 0),
          "red": (0, 0, 255), "magenta": (255, 0, 255),
          "matlab_blue": (189, 114, 0), "matlab_orange": (25, 83, 217)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("pattern")
    p.add_argument("save")
    p.add_argument("--rect", nargs=4, type=int, required=True,
                   metavar=("H_START", "W_START", "H_LEN", "W_LEN"))
    p.add_argument("--ratio", type=int, default=3)
    p.add_argument("--line-width", type=int, default=2)
    p.add_argument("--color", default="yellow", choices=sorted(COLORS))
    args = p.parse_args()

    import cv2

    hs, ws, hl, wl = args.rect
    color = COLORS[args.color]
    files = sorted(glob.glob(args.pattern))
    if not files:
        raise SystemExit(f"nothing matches {args.pattern}")
    os.makedirs(args.save, exist_ok=True)
    for path in files:
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img is None:
            print(f"skip (unreadable): {path}")
            continue
        base = os.path.splitext(os.path.basename(path))[0]
        patch = img[hs:hs + hl, ws:ws + wl]
        patch = cv2.resize(patch, None, fx=args.ratio, fy=args.ratio,
                           interpolation=cv2.INTER_NEAREST)
        cv2.imwrite(os.path.join(args.save, f"{base}_patch.png"), patch)
        rect = img.copy()
        cv2.rectangle(rect, (ws, hs), (ws + wl, hs + hl), color,
                      args.line_width)
        cv2.imwrite(os.path.join(args.save, f"{base}_rect.png"), rect)
        print(base)
    print(f"{len(files)} images -> {args.save}")


if __name__ == "__main__":
    main()
