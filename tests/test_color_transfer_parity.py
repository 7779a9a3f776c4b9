"""Output parity of scripts/color_transfer.py against the reference
implementation (ref codes/scripts/color_transfer.py), algo for algo, on
a real fixture pair. The reference module is imported read-only as the
oracle; determinism notes per algo below."""

import importlib.util
import os
import sys

import cv2
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "scripts"))
import color_transfer as ct  # noqa: E402


def _load_reference():
    path = "/root/reference/codes/scripts/color_transfer.py"
    spec = importlib.util.spec_from_file_location("ref_color_transfer",
                                                  path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


REF = _load_reference()


@pytest.fixture(scope="module")
def pair():
    src = cv2.imread("/root/reference/data_samples/samples/OST_013.png",
                     cv2.IMREAD_COLOR)[40:168, 60:220]
    tgt = cv2.imread("/root/reference/codes/dataops/augmennt/cat.jpg",
                     cv2.IMREAD_COLOR)[100:228, 200:360]
    assert src is not None and tgt is not None
    return src, tgt


def test_stats_transfer_exact(pair):
    src, tgt = pair
    ours = ct.stats_transfer(src, tgt)
    ref = REF.stats_transfer(source=src, target=tgt)
    assert ours.dtype == np.uint8
    np.testing.assert_array_equal(ours, ref)


def test_lab_transfer_exact(pair):
    src, tgt = pair
    np.testing.assert_array_equal(ct.lab_transfer(src, tgt),
                                  REF.lab_transfer(source=src, target=tgt))


@pytest.mark.parametrize("keep_y,histo_match",
                         [(True, False), (False, False), (True, True)])
def test_ycbcr_transfer_exact(pair, keep_y, histo_match):
    src, tgt = pair
    ours = ct.ycbcr_transfer(src, tgt, keep_y=keep_y,
                             histo_match=histo_match)
    ref = REF.ycbcr_transfer(source=src, target=tgt, keep_y=keep_y,
                             histo_match=histo_match)
    np.testing.assert_array_equal(ours, ref)


def test_luminance_transfer_exact(pair):
    src, tgt = pair
    np.testing.assert_array_equal(
        ct.luminance_transfer(src, tgt),
        REF.luminance_transfer(source=src, target=tgt))


def test_hue_transfer_exact(pair):
    src, tgt = pair
    np.testing.assert_array_equal(
        ct.hue_transfer(src, tgt),
        REF.hue_transfer(source=src, target=tgt))


def test_histogram_matching_exact(pair):
    src, tgt = pair
    np.testing.assert_array_equal(
        ct.histogram_matching(reference=src, image=tgt),
        REF.histogram_matching(reference=src, image=tgt))


def test_replace_channels_exact(pair):
    src, tgt = pair
    for kwargs in ({"ycbcr": True, "hsv": False, "transfersv": False},
                   {"ycbcr": True, "hsv": True, "transfersv": True},
                   {"ycbcr": False, "hsv": True, "transfersv": False}):
        np.testing.assert_array_equal(
            ct.replace_channels(src, tgt, **kwargs),
            REF.replace_channels(source=src, target=tgt, **kwargs))


def test_pdf_transfer_exact(pair):
    # deterministic: fixed optimal rotations, n=300 lattice
    src, tgt = pair
    ours = ct.pdf_transfer(src, tgt)
    ref = REF.PDFTransfer(n=300).pdf_tranfer(source=src, target=tgt)
    np.testing.assert_array_equal(ours, ref)


def test_sot_transfer_exact(pair):
    # both implementations draw directions from the global np.random
    # state in the same order -> identical with identical seeds
    src, tgt = pair
    np.random.seed(1234)
    ours = ct.sot_transfer(src, tgt, steps=4, batch_size=3)
    np.random.seed(1234)
    ref = REF.SOTransfer(src, tgt, steps=4, batch_size=3)
    np.testing.assert_array_equal(ours, ref)


def test_regrain_exact(pair):
    src, tgt = pair
    graded = ct.stats_transfer(src, tgt)
    ours = ct.regrain(source=graded, target=tgt)
    ref = REF.Regrain().regrain(source=graded, target=tgt)
    np.testing.assert_array_equal(ours, ref)


def test_cli_chain(tmp_path, pair):
    src, tgt = pair
    sp, tp, op = (str(tmp_path / n) for n in ("s.png", "t.png", "o.png"))
    cv2.imwrite(sp, src)
    cv2.imwrite(tp, tgt)
    import subprocess

    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "scripts",
                      "color_transfer.py"),
         sp, tp, op, "--algo", "lab,histo", "--regrain"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    out = cv2.imread(op, cv2.IMREAD_COLOR)
    assert out is not None and out.shape == tgt.shape


def test_float_wrapper_roundtrip(pair):
    src, tgt = pair
    s = src[..., ::-1].astype(np.float32) / 255.0
    t = tgt[..., ::-1].astype(np.float32) / 255.0
    out = ct.color_transfer(s, t, "rgb")
    assert out.shape == t.shape and out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0
