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

    m = LPIPSMetric(net="squeeze", allow_random=True)
    rng = np.random.default_rng(0)
    a = rng.random((64, 64, 3)).astype(np.float32)
    b = rng.random((64, 64, 3)).astype(np.float32)
    assert m(a, a) < 1e-6
    assert m(a, b) > 0.0


def test_lpips_metric_loud_failure(monkeypatch):
    """Requesting lpips without backbone weights must raise, not silently
    score with a random-init net (VERDICT r1 missing #1)."""
    from trainner_tpu.losses.lpips import LPIPSWeightsMissing

    monkeypatch.delenv("TRAINNER_LPIPS_WEIGHTS", raising=False)
    from trainner_tpu.losses.lpips import LPIPSMetric

    with pytest.raises(LPIPSWeightsMissing):
        LPIPSMetric(net="squeeze")

    from trainner_tpu.utils.metrics import MetricsDict

    with pytest.raises(LPIPSWeightsMissing):
        MetricsDict("psnr,lpips")


def _torch_squeeze_backbone(torch):
    """torchvision squeezenet1_1 `.features` twin (random weights) —
    same module indices/state-dict keys as the real one."""
    nn = torch.nn

    class Fire(nn.Module):
        def __init__(self, inp, s, e):
            super().__init__()
            self.squeeze = nn.Conv2d(inp, s, 1)
            self.expand1x1 = nn.Conv2d(s, e, 1)
            self.expand3x3 = nn.Conv2d(s, e, 3, padding=1)
            self.act = nn.ReLU()

        def forward(self, x):
            x = self.act(self.squeeze(x))
            return torch.cat([self.act(self.expand1x1(x)),
                              self.act(self.expand3x3(x))], 1)

    return nn.Sequential(
        nn.Conv2d(3, 64, 3, stride=2), nn.ReLU(),
        nn.MaxPool2d(3, 2, ceil_mode=True),
        Fire(64, 16, 64), Fire(128, 16, 64),
        nn.MaxPool2d(3, 2, ceil_mode=True),
        Fire(128, 32, 128), Fire(256, 32, 128),
        nn.MaxPool2d(3, 2, ceil_mode=True),
        Fire(256, 48, 192), Fire(384, 48, 192),
        Fire(384, 64, 256), Fire(512, 64, 256))


def test_lpips_full_distance_parity(tmp_path):
    """End-to-end LPIPS parity: a torch squeezenet backbone (random
    weights, torchvision key layout) + the reference's calibrated lin
    weights, converted via `lpips-full`, reproduces the torch LPIPS
    distance (ref modules/LPIPS/networks_basic.py PNetLin form) <1e-4."""
    torch = pytest.importorskip("torch")
    lin_pth = ("/root/reference/codes/models/modules/LPIPS/lpips_weights/"
               "v0.1/squeeze.pth")
    import os
    import sys

    if not os.path.exists(lin_pth):
        pytest.skip("reference lpips weights not present")

    torch.manual_seed(7)
    net = _torch_squeeze_backbone(torch).eval()
    # shrink random conv weights so deep activations stay O(1)
    for mod in net.modules():
        if isinstance(mod, torch.nn.Conv2d):
            mod.weight.data *= 0.3
    sd = {k: v for k, v in net.state_dict().items()}
    # rewrite Fire keys ('3.squeeze.weight') to torchvision layout
    # ('features.3.squeeze.weight'); plain convs get 'features.N.weight'
    tv_sd = {f"features.{k}": v for k, v in sd.items()}
    pth = str(tmp_path / "squeezenet1_1.pth")
    torch.save(tv_sd, pth)

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import convert_torch_model as conv

    npz = str(tmp_path / "lpips_squeeze.npz")
    conv.convert_lpips_full(pth, npz, "squeeze", lin_src=lin_pth)

    # torch LPIPS reference computation (PNetLin functional form)
    lin_sd = torch.load(lin_pth, map_location="cpu", weights_only=True)
    lins = [lin_sd[f"lin{i}.model.1.weight"].reshape(-1) for i in range(7)]
    shift = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
    scale = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)

    def torch_feats(x):
        taps = []
        h = (2.0 * x - 1.0 - shift) / scale
        for i, mod in enumerate(net):
            h = mod(h)
            if i in (1, 4, 7, 9, 10, 11, 12):  # relu1 + fires 2/4/5/6/7/8
                taps.append(h)
        return taps

    rng = np.random.default_rng(3)
    a = rng.random((1, 3, 64, 64), np.float32)
    b = np.clip(a + 0.1 * rng.standard_normal(a.shape, np.float32), 0, 1)
    with torch.no_grad():
        fa = torch_feats(torch.from_numpy(a))
        fb = torch_feats(torch.from_numpy(b))
        ref_d = 0.0
        for fx, fy, w in zip(fa, fb, lins):
            nx = fx / (fx.norm(dim=1, keepdim=True) + 1e-10)
            ny = fy / (fy.norm(dim=1, keepdim=True) + 1e-10)
            diff = (nx - ny) ** 2
            ref_d += (diff * w.view(1, -1, 1, 1)).sum(1).mean()
        ref_d = float(ref_d)

    from trainner_tpu.losses.lpips import LPIPSMetric

    m = LPIPSMetric(net="squeeze", weights_path=npz)
    ours = m(a[0].transpose(1, 2, 0), b[0].transpose(1, 2, 0))
    assert abs(ours - ref_d) < 1e-4, (ours, ref_d)


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
