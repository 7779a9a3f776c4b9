"""Sequentially renumber (copy or move) files matching a glob pattern.

Equivalent of ref codes/scripts/rename.py, but takes its inputs on the
command line instead of hand-edited constants.

Usage:
  python scripts/rename.py 'results/*/img_*.png' out_dir --prefix img \
      --mode cp
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil


def main():
    p = argparse.ArgumentParser()
    p.add_argument("pattern", help="glob matching the source files")
    p.add_argument("save")
    p.add_argument("--prefix", default="")
    p.add_argument("--start", type=int, default=1)
    p.add_argument("--mode", choices=("cp", "mv"), default="cp")
    args = p.parse_args()

    files = sorted(glob.glob(args.pattern))
    if not files:
        raise SystemExit(f"nothing matches {args.pattern}")
    os.makedirs(args.save, exist_ok=True)
    width = max(3, len(str(args.start + len(files) - 1)))
    for i, src in enumerate(files, start=args.start):
        ext = os.path.splitext(src)[1]
        dst = os.path.join(args.save,
                           f"{args.prefix}{i:0{width}d}{ext}")
        (shutil.copy2 if args.mode == "cp" else shutil.move)(src, dst)
        print(f"{src} -> {dst}")
    print(f"{args.mode} {len(files)} files")


if __name__ == "__main__":
    main()
