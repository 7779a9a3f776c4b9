"""Host-side image IO / tensor conversion / geometric helpers.

Behavioral equivalents of ref codes/dataops/common.py: read_img:130,
fix_img_channels:176, bgr2ycbcr:265, modcrop:393, augment:410 (paired
flip/rot), np2tensor:470/tensor2np:502, and channel_convert:218.

TPU-first conventions: everything host-side is numpy HWC float32 RGB in
[0,1]; batches are NHWC (channel-last is the fast layout for XLA conv on
TPU). `img2tensor` therefore does NOT transpose to CHW like the reference
— the znorm [-1,1] option is kept (ref :435-469).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover - cv2 is present in this image
    cv2 = None

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".tif", ".tiff",
                  ".webp", ".JPG", ".PNG")


def is_image_file(path: str) -> bool:
    return path.lower().endswith(tuple(e.lower() for e in IMG_EXTENSIONS))


_LMDB_READERS: dict = {}


def _lmdb_reader(root: str):
    if root not in _LMDB_READERS:
        from .lmdb_io import LmdbReader

        _LMDB_READERS[root] = LmdbReader(root)
    return _LMDB_READERS[root]


def scan_images(root: str) -> List[str]:
    """Sorted recursive image listing (ref utils/util.py scandir:75).
    A *.lmdb dataroot (ref dataops/common.py:47) yields virtual paths
    '<root>::<key>' readable by read_img."""
    if str(root).endswith(".lmdb"):
        from .lmdb_io import lmdb_paths

        return [f"{root}::{k}" for k in lmdb_paths(root)]
    out = []
    for dirpath, _, files in os.walk(root):
        for f in files:
            if is_image_file(f):
                out.append(os.path.join(dirpath, f))
    return sorted(out)


def read_img(path: str, out_nc: int = 3) -> np.ndarray:
    """Read an image file -> float32 RGB HWC in [0,1] (ref read_img:130,
    which returns BGR; we standardize on RGB and convert at IO time).
    '<root>.lmdb::<key>' virtual paths read from LMDB (ref
    _read_lmdb_img:90)."""
    if "::" in path and ".lmdb" in path:
        root, key = path.split("::", 1)
        buf = _lmdb_reader(root).get(key.encode("ascii"))
        if buf is None:
            raise IOError(f"lmdb key not found [{path}]")
        img = cv2.imdecode(np.frombuffer(buf, np.uint8),
                           cv2.IMREAD_UNCHANGED)
        if img is None:
            raise IOError(f"cannot decode lmdb image [{path}]")
        img = (img / 255.0).astype(np.float32)
        if img.ndim == 2:
            img = img[:, :, None]
        if img.shape[2] == 3:
            img = img[:, :, ::-1]  # BGR -> RGB
        return fix_img_channels(np.ascontiguousarray(img), out_nc)
    if cv2 is not None:
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img is None:
            raise IOError(f"cannot read image [{path}]")
        if img.dtype == np.uint16:
            img = (img / 65535.0).astype(np.float32)
        else:
            img = (img / 255.0).astype(np.float32)
        if img.ndim == 2:
            img = img[:, :, None]
        if img.shape[2] == 4:
            img = cv2.cvtColor(img, cv2.COLOR_BGRA2BGR)
        if img.shape[2] == 3:
            img = img[:, :, ::-1]  # BGR -> RGB
    else:  # PIL fallback
        from PIL import Image

        img = np.asarray(Image.open(path).convert("RGB"),
                         np.float32) / 255.0
    return fix_img_channels(np.ascontiguousarray(img), out_nc)


def fix_img_channels(img: np.ndarray, out_nc: int = 3) -> np.ndarray:
    """Grayscale<->RGB channel fixing (ref fix_img_channels:176)."""
    if img.ndim == 2:
        img = img[:, :, None]
    c = img.shape[2]
    if out_nc == 3 and c == 1:
        img = np.repeat(img, 3, axis=2)
    elif out_nc == 1 and c == 3:
        img = rgb2ycbcr(img, only_y=True)[:, :, None]
    elif c > out_nc:
        img = img[:, :, :out_nc]
    return img


def rgb2ycbcr(img: np.ndarray, only_y: bool = True) -> np.ndarray:
    """ITU-R BT.601 full-swing->studio-swing, matching ref bgr2ycbcr:265
    (input here RGB in [0,1])."""
    w = np.array([[65.481, -37.797, 112.0],
                  [128.553, -74.203, -93.786],
                  [24.966, 112.0, -18.214]], np.float32) / 255.0
    if only_y:
        return img @ w[:, 0] + 16.0 / 255.0
    out = img @ w + np.array([16, 128, 128], np.float32) / 255.0
    return out


def ycbcr2rgb(img: np.ndarray) -> np.ndarray:
    mat = np.array([[65.481, -37.797, 112.0],
                    [128.553, -74.203, -93.786],
                    [24.966, 112.0, -18.214]], np.float32) / 255.0
    inv = np.linalg.inv(mat.T).astype(np.float32)
    out = (img - np.array([16, 128, 128], np.float32) / 255.0) @ inv.T
    return out


def channel_convert(img: np.ndarray, color: Optional[str]) -> np.ndarray:
    """'gray' | 'y' | 'RGB' conversions (ref channel_convert:218)."""
    if not color or color in ("RGB", "rgb"):
        return img
    if color in ("gray", "grey"):
        g = img.mean(axis=2, keepdims=True) if img.shape[2] == 3 else img
        return g
    if color.lower() == "y":
        return rgb2ycbcr(img, only_y=True)[:, :, None]
    return img


def modcrop(img: np.ndarray, scale: int) -> np.ndarray:
    """Crop H,W to multiples of scale (ref modcrop:393)."""
    h, w = img.shape[:2]
    return img[: h - h % scale, : w - w % scale]


def augment_pair(imgs: Sequence[np.ndarray], hflip: bool = True,
                 rot: bool = True,
                 rng: Optional[np.random.Generator] = None
                 ) -> List[np.ndarray]:
    """Consistent random flip/rot90 across a list of images
    (ref augment:410)."""
    rng = rng or np.random.default_rng()
    do_h = hflip and rng.random() < 0.5
    do_v = rot and rng.random() < 0.5
    do_r = rot and rng.random() < 0.5

    def one(img):
        if do_h:
            img = img[:, ::-1]
        if do_v:
            img = img[::-1]
        if do_r:
            img = img.transpose(1, 0, 2)
        return np.ascontiguousarray(img)

    return [one(i) for i in imgs]


def paired_random_crop(hr: np.ndarray, lr: np.ndarray, hr_crop: int,
                       scale: int,
                       rng: Optional[np.random.Generator] = None
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Aligned random crop: HR crop of hr_crop px, LR of hr_crop/scale
    (ref get_params:457 + get_transform:520 crop path)."""
    rng = rng or np.random.default_rng()
    lr_crop = hr_crop // scale
    lh, lw = lr.shape[:2]
    if lh < lr_crop or lw < lr_crop:
        lr = np.pad(lr, ((0, max(0, lr_crop - lh)),
                         (0, max(0, lr_crop - lw)), (0, 0)), "reflect")
        hr = np.pad(hr, ((0, max(0, lr_crop - lh) * scale),
                         (0, max(0, lr_crop - lw) * scale), (0, 0)),
                    "reflect")
        lh, lw = lr.shape[:2]
    y = int(rng.integers(0, lh - lr_crop + 1))
    x = int(rng.integers(0, lw - lr_crop + 1))
    lr_c = lr[y: y + lr_crop, x: x + lr_crop]
    hr_c = hr[y * scale: y * scale + hr_crop,
              x * scale: x * scale + hr_crop]
    return hr_c, lr_c


def img2tensor(img: np.ndarray, znorm: bool = False,
               wire_u8: bool = False) -> np.ndarray:
    """HWC float32 [0,1] -> training array; znorm maps to [-1,1]
    (ref np2tensor:470; layout stays HWC for TPU).

    wire_u8 keeps the array uint8 on the wire (4x less host->device
    traffic; lossless for 8-bit sources) — trainers normalize on device
    via ops.blocks.wire_to_f01 (znorm composes there)."""
    if wire_u8:
        return np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
    img = img.astype(np.float32)
    if znorm:
        img = img * 2.0 - 1.0
    return img


def tensor2img(t, znorm: bool = False, out_type=np.uint8) -> np.ndarray:
    """Model output (HWC or NHWC, [0,1] or [-1,1]) -> uint8 HWC RGB
    (ref tensor2np:502)."""
    arr = np.asarray(t, np.float32)
    if arr.ndim == 4:
        arr = arr[0]
    if znorm:
        arr = (arr + 1.0) / 2.0
    arr = np.clip(arr, 0.0, 1.0)
    if out_type == np.uint8:
        return (arr * 255.0).round().astype(np.uint8)
    return arr


def save_img(img: np.ndarray, path: str) -> None:
    """uint8 RGB HWC -> file (ref utils/util.py save_img:115)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if cv2 is not None:
        bgr = img[:, :, ::-1] if img.ndim == 3 and img.shape[2] == 3 else img
        cv2.imwrite(path, bgr)
    else:
        from PIL import Image

        Image.fromarray(img).save(path)


def merge_imgs(imgs, axis: int = 1) -> np.ndarray:
    """Concatenate images side by side, padding to a common height/width
    (ref utils/util.py merge_imgs:123)."""
    imgs = [np.asarray(i) for i in imgs]
    hmax = max(i.shape[0] for i in imgs)
    wmax = max(i.shape[1] for i in imgs)
    padded = []
    for i in imgs:
        ph, pw = hmax - i.shape[0], wmax - i.shape[1]
        if axis == 1:
            pad = ((0, ph), (0, 0), (0, 0))[:i.ndim]
        else:
            pad = ((0, 0), (0, pw), (0, 0))[:i.ndim]
        padded.append(np.pad(i, pad))
    return np.concatenate(padded, axis=axis)


def save_img_comp(imgs, path: str) -> None:
    """Save a side-by-side comparison grid (ref utils/util.py
    save_img_comp:151; used for val image dumps)."""
    save_img(merge_imgs(imgs, axis=1), path)
