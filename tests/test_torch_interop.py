"""Tests for .pth interop (ESRGAN key mapping both directions) and LPIPS
(SURVEY.md §2.7, §7.3 item 7)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _init_rrdb(nb=2, nf=16, gc=8):
    from trainner_tpu.models.rrdb import RRDBNet

    net = RRDBNet(nf=nf, nb=nb, gc=gc, upscale=4, gaussian_noise=False,
                  dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    v = net.init({"params": rng, "noise": rng}, jnp.zeros((1, 8, 8, 3)),
                 train=False)
    return net, v


def test_esrgan_roundtrip_export_import():
    from trainner_tpu.utils.torch_interop import (esrgan_to_params,
                                                  params_to_esrgan)

    net, v = _init_rrdb()
    params = jax.tree.map(np.asarray, v["params"])
    sd = params_to_esrgan(params, nb=2)
    assert "conv_first.weight" in sd
    assert "RRDB_trunk.0.RDB1.conv1.weight" in sd
    assert sd["conv_first.weight"].shape == (16, 3, 3, 3)  # OIHW
    back = esrgan_to_params(sd, target_params=params)
    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        assert np.allclose(a, b)


def test_esrgan_old_arch_mapping():
    """Old Sequential layout (model.N.*) maps onto the same tree
    (ref networks.py mod2normal:446)."""
    from trainner_tpu.utils.torch_interop import (detect_esrgan_arch,
                                                  esrgan_to_params,
                                                  params_to_esrgan)

    net, v = _init_rrdb()
    params = jax.tree.map(np.asarray, v["params"])
    sd_new = params_to_esrgan(params, nb=2)
    # rewrite to the old layout
    sd_old = {}
    for k, val in sd_new.items():
        if k.startswith("conv_first"):
            sd_old["model.0." + k.split(".")[-1]] = val
        elif k.startswith("RRDB_trunk"):
            parts = k.split(".")
            sd_old[f"model.1.sub.{parts[1]}.{parts[2]}.{parts[3]}.0."
                   f"{parts[4]}"] = val
        elif k.startswith("trunk_conv"):
            sd_old["model.1.sub.2." + k.split(".")[-1]] = val
        elif k.startswith("upconv1"):
            sd_old["model.3." + k.split(".")[-1]] = val
        elif k.startswith("upconv2"):
            sd_old["model.6." + k.split(".")[-1]] = val
        elif k.startswith("HRconv"):
            sd_old["model.8." + k.split(".")[-1]] = val
        elif k.startswith("conv_last"):
            sd_old["model.10." + k.split(".")[-1]] = val
    assert detect_esrgan_arch(sd_old) == "old"
    back = esrgan_to_params(sd_old, target_params=params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        assert np.allclose(a, b)


def test_torch_conv_parity():
    """Converted torch conv weights reproduce torch's conv output."""
    torch = pytest.importorskip("torch")
    from trainner_tpu.utils.torch_interop import conv_to_hwio

    rng = np.random.default_rng(0)
    x = rng.random((1, 4, 10, 10)).astype(np.float32)  # NCHW
    w = rng.random((6, 4, 3, 3)).astype(np.float32)    # OIHW
    b = rng.random((6,)).astype(np.float32)
    with torch.no_grad():
        ref = torch.nn.functional.conv2d(
            torch.from_numpy(x), torch.from_numpy(w),
            torch.from_numpy(b), padding=1).numpy()
    y = jax.lax.conv_general_dilated(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(conv_to_hwio(w)), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = np.asarray(y) + b
    assert np.allclose(y.transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_lpips_functional():
    from trainner_tpu.losses.lpips import LPIPS

    for net in ("squeeze", "alex", "vgg"):
        m = LPIPS(net=net)
        rng = jax.random.PRNGKey(0)
        x = jax.random.uniform(rng, (1, 64, 64, 3))
        y = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
        v = m.init(rng, x, x)
        d_same = m.apply(v, x, x)
        d_diff = m.apply(v, x, y)
        assert float(d_same[0]) < 1e-6
        assert float(d_diff[0]) > float(d_same[0])


def test_lpips_metric_wrapper():
    from trainner_tpu.losses.lpips import LPIPSMetric

    m = LPIPSMetric(net="squeeze")
    rng = np.random.default_rng(0)
    a = rng.random((64, 64, 3)).astype(np.float32)
    b = rng.random((64, 64, 3)).astype(np.float32)
    assert m(a, a) < 1e-6
    assert m(a, b) > 0.0


def test_lpips_lin_weight_conversion():
    """The reference's bundled lin weights load into our tree."""
    torch = pytest.importorskip("torch")
    path = ("/root/reference/codes/models/modules/LPIPS/lpips_weights/"
            "v0.1/squeeze.pth")
    import os

    if not os.path.exists(path):
        pytest.skip("reference lpips weights not present")
    sd = torch.load(path, map_location="cpu", weights_only=True)
    from trainner_tpu.losses.lpips import LPIPS

    m = LPIPS(net="squeeze")
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 32, 32, 3))
    v = m.init(rng, x, x)
    params = dict(v["params"])
    for i in range(7):
        w = sd[f"lin{i}.model.1.weight"].numpy().reshape(-1)
        assert params[f"lin{i}"].shape == w.shape
        params[f"lin{i}"] = jnp.asarray(w)
    d = m.apply({"params": params}, x, x)
    assert float(d[0]) == 0.0
