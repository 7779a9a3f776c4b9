"""VGG feature-extractor parity: build a torch VGG19 feature stack
(the exact torchvision 'features' layout the reference's perceptual loss
wraps, ref models/modules/architectures/perceptual.py:73), load the SAME
random weights into our Flax VGGFeatures through the .pth->npz converter
path, and compare activations."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VGG19_CFG = (2, 2, 4, 4, 4)


def _build_torch_vgg19():
    """torchvision vgg19 .features equivalent: conv/relu stacks with
    maxpool between blocks (indices match 'features.N.*' keys)."""
    layers = []
    in_c = 3
    for b, reps in enumerate(VGG19_CFG, start=1):
        out_c = 64 * min(2 ** (b - 1), 8)
        for _ in range(reps):
            layers.append(torch.nn.Conv2d(in_c, out_c, 3, padding=1))
            layers.append(torch.nn.ReLU(inplace=False))
            in_c = out_c
        layers.append(torch.nn.MaxPool2d(2, 2))
    return torch.nn.Sequential(*layers)


def test_vgg19_feature_parity(tmp_path):
    import jax.numpy as jnp

    from trainner_tpu.models.perceptual import VGGFeatures, load_vgg_npz

    torch.manual_seed(0)
    net = _build_torch_vgg19().eval()
    # save as a torchvision-style state dict and run the converter
    sd = {f"features.{i}.{leaf}": v
          for i, mod in enumerate(net)
          if isinstance(mod, torch.nn.Conv2d)
          for leaf, v in (("weight", mod.weight.data),
                          ("bias", mod.bias.data))}
    pth = str(tmp_path / "vgg19_random.pth")
    torch.save(sd, pth)

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import convert_torch_model as conv

    npz = str(tmp_path / "vgg19.npz")
    conv.convert_vgg(pth, npz)
    variables = load_vgg_npz(npz)

    rng = np.random.default_rng(0)
    x = rng.random((2, 3, 32, 32), np.float32)
    xt = torch.from_numpy(x)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    with torch.no_grad():
        h = (xt - mean) / std
        feats_t = {}
        conv_i = 0
        names = [f"conv{b}_{c}" for b, reps in enumerate(VGG19_CFG, 1)
                 for c in range(1, reps + 1)]
        for mod in net:
            if isinstance(mod, torch.nn.Conv2d):
                h = mod(h)
                feats_t[names[conv_i]] = h.clone()
                conv_i += 1
            else:
                h = mod(h)

    listen = ("conv2_2", "conv3_4", "conv5_4")
    model = VGGFeatures(arch="vgg19", listen=listen, use_input_norm=True)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    ours = model.apply(variables, xj)
    for name in listen:
        ref = feats_t[name].numpy()
        got = np.asarray(ours[name]).transpose(0, 3, 1, 2)
        err = np.abs(ref - got).max()
        scale = max(1.0, np.abs(ref).max())
        assert err / scale < 1e-4, (name, err, scale)
