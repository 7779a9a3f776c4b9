"""Validation metrics: MATLAB-parity PSNR/SSIM + metric accumulation.

Equivalents of ref codes/utils/metrics.py: MetricsDict:15, calculate_psnr:110,
ssim/calculate_ssim:180/204 (MATLAB gaussian SSIM), calculate_lpips:232,
StatsMeter:300, Timer:354, TickTock:374, TimeMeter:408; and the offline
evaluator ref metrics/calculate_PSNR_SSIM.py:11 (crop_border shave,
Y-channel option).

Metrics run host-side in float64 numpy for exact MATLAB parity (they're
per-val-image, not in the training hot path).
"""

from __future__ import annotations

import math
import time
from typing import Dict, List, Optional

import numpy as np

__all__ = [
    "calculate_psnr", "calculate_ssim", "bgr2ycbcr_np", "rgb2ycbcr_np",
    "MetricsDict", "StatsMeter", "Timer", "TickTock", "TimeMeter",
]


def rgb2ycbcr_np(img: np.ndarray, only_y: bool = True) -> np.ndarray:
    """MATLAB rgb2ycbcr for images in [0,1] or [0,255] RGB order
    (ref dataops/common.py:265 does BGR; this is the RGB twin)."""
    in_dtype = img.dtype
    img = img.astype(np.float64)
    if in_dtype != np.uint8:
        img *= 255.0
    if only_y:
        out = np.dot(img, [65.481, 128.553, 24.966]) / 255.0 + 16.0
    else:
        out = img @ np.array([[65.481, -37.797, 112.0],
                              [128.553, -74.203, -93.786],
                              [24.966, 112.0, -18.214]]) / 255.0
        out += [16, 128, 128]
    if in_dtype == np.uint8:
        out = out.round()
    else:
        out /= 255.0
    return out.astype(in_dtype)


def bgr2ycbcr_np(img: np.ndarray, only_y: bool = True) -> np.ndarray:
    return rgb2ycbcr_np(img[..., ::-1], only_y)


def calculate_psnr(img1: np.ndarray, img2: np.ndarray,
                   max_val: float = 255.0) -> float:
    """PSNR on same-range images (ref utils/metrics.py:110)."""
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    mse = np.mean((img1 - img2) ** 2)
    if mse == 0:
        return float("inf")
    return 20 * math.log10(max_val / math.sqrt(mse))


def _ssim_single(img1: np.ndarray, img2: np.ndarray) -> float:
    """MATLAB-parity SSIM on a 2D uint8-range plane (ref
    utils/metrics.py:180, metrics/calculate_PSNR_SSIM.py ssim): 11x11
    gaussian sigma=1.5, valid convolution."""
    import cv2

    C1 = (0.01 * 255) ** 2
    C2 = (0.03 * 255) ** 2
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.transpose())
    mu1 = cv2.filter2D(img1, -1, window)[5:-5, 5:-5]
    mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = cv2.filter2D(img1**2, -1, window)[5:-5, 5:-5] - mu1_sq
    sigma2_sq = cv2.filter2D(img2**2, -1, window)[5:-5, 5:-5] - mu2_sq
    sigma12 = cv2.filter2D(img1 * img2, -1, window)[5:-5, 5:-5] - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / \
        ((mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    return float(ssim_map.mean())


def calculate_ssim(img1: np.ndarray, img2: np.ndarray) -> float:
    """SSIM over HxW or HxWxC (channel-averaged), images in [0,255]
    (ref utils/metrics.py:204)."""
    if img1.shape != img2.shape:
        raise ValueError("Input images must have the same dimensions.")
    if img1.ndim == 2:
        return _ssim_single(img1, img2)
    if img1.ndim == 3:
        if img1.shape[2] == 3:
            return float(np.mean(
                [_ssim_single(img1[..., i], img2[..., i]) for i in range(3)]))
        return _ssim_single(np.squeeze(img1), np.squeeze(img2))
    raise ValueError("Wrong input image dimensions.")


def crop_border(img: np.ndarray, border: int) -> np.ndarray:
    """Shave `border` pixels (= scale) before metric computation
    (ref metrics/calculate_PSNR_SSIM.py:30)."""
    if border == 0:
        return img
    return img[border:-border, border:-border, ...]


# ---------------------------------------------------------------------------
# metric accumulation (ref utils/metrics.py MetricsDict:15)
# ---------------------------------------------------------------------------


class MetricsDict:
    """Accumulates selected metrics over a validation run.

    metrics: comma string 'psnr,ssim,lpips' (same surface as reference).
    Images are HWC RGB float [0,1] or uint8 [0,255].
    """

    def __init__(self, metrics: str = "psnr", lpips_model=None,
                 lpips_weights: Optional[str] = None):
        self.names = [m.strip().lower() for m in metrics.split(",") if m.strip()]
        self.results: List[Dict[str, float]] = []
        if lpips_model is None and "lpips" in self.names:
            # loud by design: requesting lpips without weights must fail at
            # setup, not silently score with a random-init net
            from ..losses.lpips import LPIPSMetric
            lpips_model = LPIPSMetric(net="squeeze",
                                      weights_path=lpips_weights)
        self._lpips = lpips_model

    def calculate_metrics(self, sr: np.ndarray, gt: np.ndarray,
                          crop_size: int = 0, only_y: bool = False) -> Dict:
        sr = np.asarray(sr)
        gt = np.asarray(gt)
        if sr.dtype != np.uint8 and sr.max() <= 1.5:
            sr255, gt255 = sr * 255.0, gt * 255.0
        else:
            sr255, gt255 = sr.astype(np.float64), gt.astype(np.float64)
        if only_y and sr255.ndim == 3 and sr255.shape[2] == 3:
            sr255 = rgb2ycbcr_np(sr255.astype(np.float64) / 255.0, True) * 255.0
            gt255 = rgb2ycbcr_np(gt255.astype(np.float64) / 255.0, True) * 255.0
        sr_c = crop_border(sr255, crop_size)
        gt_c = crop_border(gt255, crop_size)
        entry: Dict[str, float] = {}
        for m in self.names:
            if m == "psnr":
                entry["psnr"] = calculate_psnr(sr_c, gt_c)
            elif m == "ssim":
                entry["ssim"] = calculate_ssim(sr_c, gt_c)
            elif m == "lpips" and self._lpips is not None:
                entry["lpips"] = float(self._lpips(sr, gt))
            # unknown metric names are skipped
        self.results.append(entry)
        return entry

    def get_averages(self) -> List[Dict]:
        """Average each metric over the accumulated results (ref :97)."""
        if not self.results:
            return []
        avgs = []
        for m in self.names:
            vals = [r[m] for r in self.results if m in r]
            if vals:
                avgs.append({"name": m, "average": float(np.mean(vals))})
        return avgs

    def reset(self):
        self.results = []


# ---------------------------------------------------------------------------
# meters / timers (ref utils/metrics.py:300-465)
# ---------------------------------------------------------------------------


class StatsMeter:
    """Running average meter (ref StatsMeter:300)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class Timer:
    """Per-iteration timer with running average (ref Timer:354)."""

    def __init__(self, avg: bool = True):
        self.avg = avg
        self.reset()

    def reset(self):
        self.calls = 0
        self.start_time = 0.0
        self.total_time = 0.0
        self.diff = 0.0

    def tic(self):
        self.start_time = time.time()

    def toc(self, average: Optional[bool] = None) -> float:
        self.diff = time.time() - self.start_time
        self.total_time += self.diff
        self.calls += 1
        use_avg = self.avg if average is None else average
        return self.total_time / self.calls if use_avg else self.diff

    def get_average_time(self):
        return self.toc(average=True)


class TickTock:
    """Data-load / epoch timing (ref TickTock:374)."""

    def __init__(self):
        self.time_start = None
        self.time_end = None

    def tick(self):
        self.time_start = time.time()

    def tock(self) -> float:
        self.time_end = time.time()
        return self.elapsed()

    def elapsed(self) -> float:
        if self.time_start is None or self.time_end is None:
            return 0.0
        return self.time_end - self.time_start


class TimeMeter:
    """Throughput meter: fps & Mpx/s (ref TimeMeter:408)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.frames = 0
        self.pixels = 0
        self.start = time.time()

    def update(self, n_frames: int, n_pixels: int):
        self.frames += n_frames
        self.pixels += n_pixels

    def stats(self) -> Dict[str, float]:
        dt = max(time.time() - self.start, 1e-9)
        return {"fps": self.frames / dt, "mpx_s": self.pixels / dt / 1e6}
