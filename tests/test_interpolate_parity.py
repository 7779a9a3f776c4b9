"""ops.blocks.interpolate == torch.nn.functional.interpolate semantics
(asymmetric nearest indexing, half-pixel bilinear without antialiasing)
across integer and fractional up/down factors — guarding the fast paths
(repeat / strided slice) and the general gather path alike."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from trainner_tpu.ops.blocks import interpolate  # noqa: E402


def _torch_interp(x_nhwc, size=None, scale=None, mode="nearest"):
    t = torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2))
    kw = {}
    if mode != "nearest":
        kw["align_corners"] = False
    if size is not None:
        y = torch.nn.functional.interpolate(t, size=size, mode=mode, **kw)
    else:
        y = torch.nn.functional.interpolate(t, scale_factor=scale,
                                            mode=mode, **kw)
    return y.numpy().transpose(0, 2, 3, 1)


CASES = [
    # (in_hw, size/scale, mode)
    ((8, 8), {"scale": 2}, "nearest"),       # integer up -> repeat path
    ((8, 8), {"scale": 0.5}, "nearest"),     # integer down -> stride path
    ((8, 6), {"size": (5, 7)}, "nearest"),   # fractional -> gather path
    ((9, 7), {"size": (4, 3)}, "nearest"),
    ((8, 8), {"scale": 2}, "bilinear"),
    ((8, 8), {"scale": 0.5}, "bilinear"),    # no antialias on downscale
    ((10, 6), {"size": (7, 9)}, "bilinear"),
]


@pytest.mark.parametrize("hw,arg,mode", CASES)
def test_interpolate_matches_torch(hw, arg, mode):
    rng = np.random.default_rng(0)
    x = rng.random((2, *hw, 3), np.float32)
    if "size" in arg:
        ours = interpolate(jnp.asarray(x), size=arg["size"], mode=mode)
        ref = _torch_interp(x, size=arg["size"], mode=mode)
    else:
        ours = interpolate(jnp.asarray(x), scale=arg["scale"], mode=mode)
        ref = _torch_interp(x, scale=arg["scale"], mode=mode)
    assert ours.shape == ref.shape
    err = np.abs(np.asarray(ours) - ref).max()
    assert err < 1e-6, (hw, arg, mode, err)
