"""Golden parity tests against the reference implementation (imported
read-only from /root/reference — SURVEY.md §7.2 gate: numerical parity of
the dataops/metrics primitives). Skipped when the reference tree is not
mounted."""

import importlib
import os
import sys

import numpy as np
import pytest

REF = "/root/reference/codes"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")

if os.path.isdir(REF) and REF not in sys.path:
    # APPEND, never prepend: the reference tree has top-level modules
    # (train, utils, models, dataops) that must not shadow ours
    sys.path.append(REF)

# the reference imports torchvision at module scope; it is not installed
# here — stub just enough for import (we only call pure-numpy functions)
if "torchvision" not in sys.modules:
    import types

    tv = types.ModuleType("torchvision")
    tv.utils = types.ModuleType("torchvision.utils")
    tv.utils.save_image = lambda *a, **k: None
    tv.utils.make_grid = lambda *a, **k: None
    tv.models = types.ModuleType("torchvision.models")
    tv.transforms = types.ModuleType("torchvision.transforms")
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.utils"] = tv.utils
    sys.modules["torchvision.models"] = tv.models
    sys.modules["torchvision.transforms"] = tv.transforms


def test_resize_parity_all_kernels():
    m = importlib.import_module("dataops.imresize")
    from trainner_tpu.ops.imresize import imresize_np

    rng = np.random.default_rng(0)
    img = rng.random((37, 53, 3)).astype(np.float32)
    for scale in (0.25, 0.5, 2.0, 3.0):
        for kern in ("cubic", "linear", "lanczos2", "lanczos3", "box",
                     "hermite", "mitchell", "catrom", "hanning",
                     "hamming", "blackman", "gaussian", "bell"):
            try:
                theirs = np.asarray(m.resize(img, scale_factors=scale,
                                             interpolation=kern))
            except Exception:
                continue  # kernels the reference rejects for this scale
            ours = imresize_np(img, scale, kernel=kern)
            assert ours.shape == theirs.shape, (scale, kern)
            err = float(np.abs(ours - np.clip(theirs, 0, 1)).max())
            assert err < 1e-5, (scale, kern, err)


def _load_offline_metrics():
    """Load the reference's pure-numpy offline evaluator (the MATLAB-parity
    oracle, ref metrics/calculate_PSNR_SSIM.py — utils/metrics.py pulls in
    the whole torch model zoo transitively, so we use the standalone
    script instead)."""
    spec = importlib.util.spec_from_file_location(
        "ref_offline_metrics",
        "/root/reference/metrics/calculate_PSNR_SSIM.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_psnr_parity():
    ref = _load_offline_metrics()
    from trainner_tpu.utils.metrics import calculate_psnr

    rng = np.random.default_rng(1)
    a = rng.integers(0, 255, (64, 64, 3)).astype(np.float64)
    b = np.clip(a + rng.normal(0, 12, a.shape), 0, 255)
    ours = calculate_psnr(a, b)
    theirs = ref.calculate_psnr(a, b)
    assert abs(ours - theirs) < 1e-6


def test_ssim_parity():
    ref = _load_offline_metrics()
    from trainner_tpu.utils.metrics import calculate_ssim

    rng = np.random.default_rng(2)
    a = rng.integers(0, 255, (64, 64, 3)).astype(np.float64)
    b = np.clip(a + rng.normal(0, 12, a.shape), 0, 255)
    ours = calculate_ssim(a, b)
    theirs = ref.calculate_ssim(a, b)
    assert abs(ours - theirs) < 1e-6


def test_bgr2ycbcr_parity():
    common = importlib.import_module("dataops.common")
    from trainner_tpu.utils.metrics import rgb2ycbcr_np

    rng = np.random.default_rng(3)
    img = rng.random((16, 16, 3)).astype(np.float32)
    theirs = common.bgr2ycbcr(img[..., ::-1], only_y=True)
    ours = rgb2ycbcr_np(img, only_y=True)
    assert np.abs(ours - theirs).max() < 1e-5
