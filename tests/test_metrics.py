"""MATLAB-parity metric tests (PSNR/SSIM golden behavior, crop shave,
Y-channel conversion) — ref utils/metrics.py + metrics/calculate_PSNR_SSIM.py."""

import numpy as np
import pytest

from trainner_tpu.utils.metrics import (
    MetricsDict,
    StatsMeter,
    calculate_psnr,
    calculate_ssim,
    crop_border,
    rgb2ycbcr_np,
)


def test_psnr_known_value():
    a = np.zeros((16, 16), np.float64)
    b = np.full((16, 16), 10.0)
    # mse=100 -> psnr = 20log10(255/10) = 28.1308
    assert calculate_psnr(a, b) == pytest.approx(28.1308, abs=1e-3)


def test_psnr_identical_inf():
    a = np.ones((8, 8)) * 42
    assert calculate_psnr(a, a) == float("inf")


def test_ssim_identity():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (64, 64)).astype(np.float64)
    assert calculate_ssim(img, img) == pytest.approx(1.0, abs=1e-9)


def test_ssim_noise_degrades():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (64, 64, 3))
    noisy = np.clip(img + rng.normal(0, 20, img.shape), 0, 255)
    v = calculate_ssim(img, noisy)
    assert 0.1 < v < 0.99


def test_rgb2ycbcr_matches_matlab_constants():
    # pure white -> Y=235 (MATLAB headroom), pure black -> 16
    white = np.ones((2, 2, 3), np.float64)
    black = np.zeros((2, 2, 3), np.float64)
    assert rgb2ycbcr_np(white, True)[0, 0] * 255 == pytest.approx(235.0, abs=0.1)
    assert rgb2ycbcr_np(black, True)[0, 0] * 255 == pytest.approx(16.0, abs=0.1)


def test_crop_border():
    img = np.arange(100).reshape(10, 10)
    assert crop_border(img, 2).shape == (6, 6)
    assert crop_border(img, 0).shape == (10, 10)


def test_metrics_dict_accumulation():
    rng = np.random.default_rng(1)
    md = MetricsDict("psnr,ssim")
    for _ in range(3):
        gt = rng.uniform(0, 1, (32, 32, 3))
        sr = np.clip(gt + rng.normal(0, 0.05, gt.shape), 0, 1)
        entry = md.calculate_metrics(sr, gt, crop_size=4)
        assert "psnr" in entry and "ssim" in entry
    avgs = md.get_averages()
    assert {a["name"] for a in avgs} == {"psnr", "ssim"}
    md.reset()
    assert md.get_averages() == []


def test_stats_meter():
    m = StatsMeter()
    for v in (1.0, 2.0, 3.0):
        m.update(v)
    assert m.avg == pytest.approx(2.0)
