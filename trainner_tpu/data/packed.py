"""Packed single-file image dataset (the TPU-native replacement for the
reference's LMDB backend — ref codes/dataops/common.py _init_lmdb:61 /
_read_lmdb_img:90 and codes/scripts/create_lmdb.py).

The environment ships no lmdb binding, and LMDB's many-small-read pattern
is a poor fit for sequential-prefetch input pipelines anyway. Format
`.tpak`: a JSON index {key: [offset, length, h, w, c]} + concatenated
encoded (PNG/JPG) or raw payloads in one file — one open fd, O(1) random
access by offset, trivially shardable across hosts.

Layout:  [8-byte index_len][index JSON][payload bytes...]
"""

from __future__ import annotations

import json
import os
import struct
from typing import Dict, List

import numpy as np


class PackedWriter:
    def __init__(self, path: str):
        self.path = path
        self.entries: Dict[str, List[int]] = {}
        self.payloads: List[bytes] = []
        self.offset = 0

    def add_image(self, key: str, img: np.ndarray) -> None:
        """img: HWC uint8 or float32 [0,1] (stored as PNG via cv2)."""
        import cv2

        if img.dtype != np.uint8:
            img = np.clip(img * 255.0, 0, 255).astype(np.uint8)
        ok, enc = cv2.imencode(".png", img[..., ::-1])  # RGB -> BGR
        assert ok, f"PNG encode failed for {key}"
        data = enc.tobytes()
        h, w = img.shape[:2]
        c = img.shape[2] if img.ndim == 3 else 1
        self.entries[key] = [self.offset, len(data), h, w, c]
        self.payloads.append(data)
        self.offset += len(data)

    def close(self) -> None:
        index = json.dumps(self.entries).encode()
        with open(self.path, "wb") as f:
            f.write(struct.pack("<Q", len(index)))
            f.write(index)
            for p in self.payloads:
                f.write(p)


class PackedReader:
    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            (index_len,) = struct.unpack("<Q", f.read(8))
            self.index: Dict[str, List[int]] = json.loads(
                f.read(index_len).decode())
        self.base = 8 + index_len
        self._f = open(path, "rb")
        self.keys = sorted(self.index)

    def __len__(self) -> int:
        return len(self.keys)

    def read(self, key: str) -> np.ndarray:
        """Returns HWC float32 RGB in [0,1]."""
        import cv2

        off, length, h, w, c = self.index[key]
        self._f.seek(self.base + off)
        buf = np.frombuffer(self._f.read(length), np.uint8)
        img = cv2.imdecode(buf, cv2.IMREAD_UNCHANGED)
        if img.ndim == 2:
            img = img[..., None]
        if img.shape[2] == 3:
            img = img[..., ::-1]  # BGR -> RGB
        return np.ascontiguousarray(img).astype(np.float32) / 255.0

    def close(self) -> None:
        self._f.close()


def pack_folder(src_dir: str, out_path: str) -> int:
    """Pack every image under src_dir (the create_lmdb.py equivalent)."""
    from .common import read_img, scan_images

    w = PackedWriter(out_path)
    paths = scan_images(src_dir)
    for p in paths:
        key = os.path.splitext(os.path.relpath(p, src_dir))[0]
        w.add_image(key, read_img(p))
    w.close()
    return len(paths)
