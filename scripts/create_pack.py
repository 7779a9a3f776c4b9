"""Pack an image folder into a single .tpak file (the reference's
create_lmdb.py equivalent, ref codes/scripts/create_lmdb.py).

Usage: python scripts/create_pack.py /path/to/images out.tpak
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src_dir")
    p.add_argument("out")
    args = p.parse_args()
    from trainner_tpu.data.packed import pack_folder

    n = pack_folder(args.src_dir, args.out)
    print(f"packed {n} images -> {args.out}")


if __name__ == "__main__":
    main()
