"""Host-side EXACT degradation ops (numpy/cv2) — the bitwise-faithful
counterparts of the on-device pipeline, used for parity testing and for
ops whose exact form needs the original codecs (real JPEG/WebP bitstream
round-trips, cv2 blur kernels).

Mirrors ref codes/dataops/augmennt/augmennt/transforms.py:
RandomCompression:1706 (cv2.imencode round-trip), blur families
:1939-2114, RandomGaussianNoise:1509 — one function per op, operating on
HWC float32 [0,1] numpy images.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _to_u8(img: np.ndarray) -> np.ndarray:
    return np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)


def _to_f32(img: np.ndarray) -> np.ndarray:
    return img.astype(np.float32) / 255.0


def jpeg_compress_exact(img: np.ndarray, quality: int) -> np.ndarray:
    """Real libjpeg bitstream round-trip (ref RandomCompression:1706)."""
    import cv2

    ok, enc = cv2.imencode(".jpg", _to_u8(img)[..., ::-1],
                           [cv2.IMWRITE_JPEG_QUALITY, int(quality)])
    assert ok
    dec = cv2.imdecode(enc, cv2.IMREAD_UNCHANGED)
    return _to_f32(dec[..., ::-1])


def webp_compress_exact(img: np.ndarray, quality: int) -> np.ndarray:
    import cv2

    ok, enc = cv2.imencode(".webp", _to_u8(img)[..., ::-1],
                           [cv2.IMWRITE_WEBP_QUALITY, int(quality)])
    assert ok
    dec = cv2.imdecode(enc, cv2.IMREAD_UNCHANGED)
    return _to_f32(dec[..., ::-1])


def gaussian_blur_exact(img: np.ndarray, kernel_size: int,
                        sigma: float) -> np.ndarray:
    import cv2

    return cv2.GaussianBlur(img, (kernel_size, kernel_size), sigma)


def motion_blur_exact(img: np.ndarray, kernel_size: int,
                      angle: float) -> np.ndarray:
    import cv2

    k = np.zeros((kernel_size, kernel_size), np.float32)
    k[kernel_size // 2, :] = 1.0
    m = cv2.getRotationMatrix2D((kernel_size / 2 - 0.5,
                                 kernel_size / 2 - 0.5), angle, 1.0)
    k = cv2.warpAffine(k, m, (kernel_size, kernel_size))
    k = k / max(k.sum(), 1e-8)
    return cv2.filter2D(img, -1, k)


def gaussian_noise_exact(img: np.ndarray, sigma255: float,
                         rng: Optional[np.random.Generator] = None,
                         gray: bool = False) -> np.ndarray:
    rng = rng or np.random.default_rng()
    shape = img.shape[:2] + ((1,) if gray else (img.shape[2],))
    noise = rng.normal(0.0, sigma255 / 255.0, shape).astype(np.float32)
    return np.clip(img + noise, 0.0, 1.0)


def clahe_exact(img: np.ndarray, clip_limit: float = 2.0,
                tile_grid: Tuple[int, int] = (8, 8)) -> np.ndarray:
    """CLAHE on the L channel (ref augmennt CLAHE:2645; host-only op)."""
    import cv2

    lab = cv2.cvtColor(_to_u8(img), cv2.COLOR_RGB2LAB)
    clahe = cv2.createCLAHE(clipLimit=clip_limit, tileGridSize=tile_grid)
    lab[..., 0] = clahe.apply(lab[..., 0])
    return _to_f32(cv2.cvtColor(lab, cv2.COLOR_LAB2RGB))
