"""Generate the payload set for the cross-implementation LMDB fixture.

Mirrors what the reference's codes/scripts/create_lmdb.py stores: values
are cv2 PNG-encoded images (compress level 1), keys are the image name
without extension, plus a meta_info.txt with `name.png (h,w,c) 1` lines
(ref create_lmdb.py:41-58). Includes values above liblmdb's inline
nodemax (2040 bytes at psize 4096) to exercise OVERFLOW pages, and
enough keys to force a branch level.

Run from repo root:
  python tests/fixtures/lmdb_ref/gen_payloads.py /tmp/lmdb_payloads
  gcc -O2 -o /tmp/make_fixture tests/fixtures/lmdb_ref/make_fixture.c
  /tmp/make_fixture /tmp/lmdb_payloads tests/fixtures/lmdb_ref/data.mdb
"""

import hashlib
import json
import os
import sys

import cv2
import numpy as np


def main(out_dir: str, meta_dir: str = None) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(20260817)
    names, expected = [], {}
    # meta_dir: where expected.json / meta_info.txt land (defaults to
    # this fixture dir; tests pass a tmp dir to avoid overwriting)
    here = meta_dir or os.path.dirname(os.path.abspath(__file__))
    meta_lines = []
    for i in range(72):
        if i < 3:  # overflow-sized values (> 2040 B)
            h = w = 48
        else:  # inline values
            h = w = 12
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        ok, buf = cv2.imencode(".png", img,
                               [cv2.IMWRITE_PNG_COMPRESSION, 1])
        assert ok
        key = f"baboon_s{i:03d}"
        with open(os.path.join(out_dir, key), "wb") as f:
            f.write(buf.tobytes())
        names.append(key)
        expected[key] = {"sha256": hashlib.sha256(buf).hexdigest(),
                         "shape": [h, w, 3], "nbytes": int(buf.size)}
        meta_lines.append(f"{key}.png ({h},{w},3) 1")
    with open(os.path.join(out_dir, "manifest.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    with open(os.path.join(here, "expected.json"), "w") as f:
        json.dump(expected, f, indent=1, sort_keys=True)
    with open(os.path.join(here, "meta_info.txt"), "w") as f:
        f.write("\n".join(meta_lines) + "\n")
    print(f"{len(names)} payloads -> {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/lmdb_payloads",
         sys.argv[2] if len(sys.argv) > 2 else None)
