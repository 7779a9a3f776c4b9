"""Tests for debug utils, flow IO, color transfer (SURVEY.md §2.4, §2.8)."""

import numpy as np
import pytest


def test_describe_array():
    from trainner_tpu.utils.debug import describe_array

    s = describe_array(np.ones((2, 3)), "x")
    assert "shape=(2, 3)" in s and "mean=1" in s
    s = describe_array(np.array([1.0, np.nan]), "y")
    assert "NONFINITE=1" in s


def test_flo_roundtrip(tmp_path):
    from trainner_tpu.utils.flow_utils import read_flo, write_flo

    flow = np.random.default_rng(0).normal(size=(8, 6, 2)).astype(
        np.float32)
    p = str(tmp_path / "f.flo")
    write_flo(p, flow)
    back = read_flo(p)
    assert np.allclose(back, flow)


def test_flow2rgb():
    from trainner_tpu.utils.flow_utils import flow2rgb

    flow = np.zeros((8, 8, 2), np.float32)
    flow[:, :4, 0] = 1.0
    flow[:, 4:, 0] = -1.0
    rgb = flow2rgb(flow)
    assert rgb.shape == (8, 8, 3)
    assert 0.0 <= rgb.min() and rgb.max() <= 1.0
    # opposite directions get different colors
    assert not np.allclose(rgb[0, 0], rgb[0, 7])


def test_color_transfer_mean_std():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from color_transfer import color_transfer

    rng = np.random.default_rng(0)
    src = rng.random((32, 32, 3)).astype(np.float32) * 0.5
    tgt = rng.random((32, 32, 3)).astype(np.float32) * 0.5 + 0.5
    # rgb stats transfer moves the target's stats onto the source's
    out = color_transfer(src, tgt, "rgb")
    assert abs(out.mean() - src.mean()) < 0.02
    out = color_transfer(src, tgt, "pdf")
    # pdf transfer matches marginal distributions closely
    assert abs(np.percentile(out, 50) - np.percentile(src, 50)) < 0.05


def test_diagnose_grads():
    from trainner_tpu.utils.debug import diagnose_grads

    grads = {"conv1": {"kernel": np.ones((3, 3)), "bias": np.ones(3)},
             "conv2": {"kernel": np.zeros((3, 3))}}
    d = diagnose_grads(grads)
    assert d["conv1"] == 1.0 and d["conv2"] == 0.0
