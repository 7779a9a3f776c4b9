"""Average every checkpoint in a directory into one model.

Equivalent of ref codes/scripts/dir_interp.py: walk `--intdir`, sum all
model files, divide by the count — a poor man's checkpoint ensemble
(uniform model soup).

Usage:
  python scripts/dir_interp.py --intdir experiments/run/models \
      --savepath soup.ckpt
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

EXTS = (".ckpt", ".msgpack")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--intdir", required=True)
    p.add_argument("--savepath", default="dirinterp.ckpt")
    args = p.parse_args()

    import jax

    from trainner_tpu.utils.checkpoint import load_params, save_params

    paths = []
    for dirpath, _, fnames in sorted(os.walk(args.intdir)):
        for fname in sorted(fnames):
            if fname.endswith(EXTS):
                paths.append(os.path.join(dirpath, fname))
    if not paths:
        raise SystemExit(f"no {EXTS} files under {args.intdir}")

    acc = load_params(paths[0])
    print(f"{paths[0]} added.")
    for path in paths[1:]:
        nxt = load_params(path)
        acc = jax.tree.map(lambda x, y: x + y, acc, nxt)
        print(f"{path} added.")
    n = float(len(paths))
    acc = jax.tree.map(lambda x: x / n, acc)
    save_params(acc, args.savepath, backup=False)
    print(f"averaged {len(paths)} models -> {args.savepath}")


if __name__ == "__main__":
    main()
