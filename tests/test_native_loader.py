"""Tests for the native C++ data-loading core (native/tpuloader.cpp)."""

import os

import numpy as np
import pytest

from trainner_tpu.data import native_loader


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for i in range(4):
        img = rng.integers(0, 255, (96, 80, 3), np.uint8)
        cv2.imwrite(str(d / f"{i}.png"), img)
        cv2.imwrite(str(d / f"{i}.jpg"), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
    return str(d)


pytestmark = pytest.mark.skipif(not native_loader.available(),
                                reason="libtpuloader.so not built")


def test_native_png_decode_matches_cv2(img_dir):
    import cv2

    p = os.path.join(img_dir, "0.png")
    ours = native_loader.decode_image(p)
    ref = cv2.imread(p)[..., ::-1].astype(np.float32) / 255.0
    assert ours.shape == ref.shape
    assert np.allclose(ours, ref, atol=1e-6)  # PNG is lossless


def test_native_jpeg_decode_close_to_cv2(img_dir):
    import cv2

    p = os.path.join(img_dir, "0.jpg")
    ours = native_loader.decode_image(p)
    ref = cv2.imread(p)[..., ::-1].astype(np.float32) / 255.0
    assert ours.shape == ref.shape
    # different IDCT implementations may differ by a few LSBs
    assert np.abs(ours - ref).mean() < 0.01


def test_native_crop_loader_batches(img_dir):
    paths = [os.path.join(img_dir, f) for f in sorted(os.listdir(img_dir))]
    ld = native_loader.NativeCropLoader(paths, crop=32, batch_size=4,
                                        n_threads=2, seed=0)
    try:
        b1 = ld.next()
        b2 = ld.next()
        assert b1.shape == (4, 32, 32, 3)
        assert b1.dtype == np.float32
        assert 0.0 <= b1.min() and b1.max() <= 1.0
        assert b1.std() > 0.1  # real image content, not zeros
        assert not np.allclose(b1, b2)  # random crops differ
    finally:
        ld.close()
