"""Shape/jit tests for the generator architecture zoo (SURVEY.md §2.6)."""

import jax
import jax.numpy as jnp
import pytest

from trainner_tpu.models.networks import define_G


def _run(opt, inp_shape, **apply_kw):
    model = define_G(opt, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    x = jnp.ones(inp_shape, jnp.float32)
    v = model.init({"params": rng, "noise": rng, "dropout": rng}, x,
                   train=False)
    return model.apply(v, x, train=False,
                       rngs={"noise": rng, "dropout": rng}, **apply_kw)


def test_unet_generator():
    y = _run({"network_G": {"type": "unet_net", "num_downs": 6, "ngf": 8}},
             (1, 64, 64, 3))
    assert y.shape == (1, 64, 64, 3)
    assert jnp.all(jnp.abs(y) <= 1.0)  # tanh output


def test_resnet_generator():
    y = _run({"network_G": {"type": "resnet_net", "n_blocks": 2, "ngf": 8}},
             (1, 32, 32, 3))
    assert y.shape == (1, 32, 32, 3)


def test_ppon_three_outputs():
    out = _run({"network_G": {"type": "ppon", "nb": 2, "nf": 16,
                              "upscale": 4}}, (1, 8, 8, 3))
    out_c, out_s, out_p = out
    assert out_c.shape == out_s.shape == out_p.shape == (1, 32, 32, 3)


def test_pan():
    y = _run({"network_G": {"type": "pan_net", "nb": 2, "nf": 16, "unf": 8,
                            "scale": 4, "self_attention": True}},
             (1, 8, 8, 3))
    assert y.shape == (1, 32, 32, 3)


def test_a2n():
    y = _run({"network_G": {"type": "a2n_net", "nb": 2, "nf": 16, "unf": 8,
                            "scale": 2}}, (1, 8, 8, 3))
    assert y.shape == (1, 16, 16, 3)


def test_wbc_unet_modes():
    for mode in ("pt", "tf"):
        y = _run({"network_G": {"type": "wbcunet_net", "nf": 8,
                                "mode": mode}}, (1, 32, 32, 3))
        assert y.shape == (1, 32, 32, 3)


def test_sofvsr():
    y = _run({"network_G": {"type": "sofvsr_net", "channels": 32,
                            "n_frames": 3, "img_ch": 3, "scale": 4,
                            "SR_net": "sofvsr"}}, (1, 3, 8, 8, 3))
    f1, f2, f3, sr = y
    assert sr.shape == (1, 32, 32, 3)
    assert f1[0].shape == (1, 4, 4, 2)
    assert f3[0].shape == (1, 32, 32, 2)


def test_sr3d():
    y = _run({"network_G": {"type": "sr3d_net", "nf": 4, "n_frames": 5,
                            "scale": 2}}, (1, 5, 8, 8, 3))
    assert y.shape == (1, 16, 16, 3)


def test_dvd():
    top, bottom = _run({"network_G": {"type": "dvd_net", "nf": 16}},
                       (1, 32, 32, 3))
    assert top.shape == (1, 32, 32, 3)
    assert bottom.shape == (1, 32, 32, 3)


def test_flow_warp_identity():
    """Zero flow must reproduce the input exactly (bilinear at grid pts)."""
    from trainner_tpu.ops.warp import flow_warp_pix, flow_warp_vsr

    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 3))
    z = jnp.zeros((2, 8, 8, 2))
    assert jnp.allclose(flow_warp_vsr(x, z), x, atol=1e-5)
    assert jnp.allclose(flow_warp_pix(x, z), x, atol=1e-5)


def test_flow_warp_shift():
    """Integer +1px x-flow shifts content left-to-right sample position."""
    from trainner_tpu.ops.warp import flow_warp_pix

    x = jnp.arange(8.0).reshape(1, 1, 8, 1)
    x = jnp.broadcast_to(x, (1, 4, 8, 1))
    flow = jnp.concatenate([jnp.ones((1, 4, 8, 1)),
                            jnp.zeros((1, 4, 8, 1))], axis=-1)
    y = flow_warp_pix(x, flow, padding_mode="border")
    # sampling at x+1 -> value increases by 1 (except clamped border)
    assert jnp.allclose(y[0, :, :-1, 0], x[0, :, 1:, 0], atol=1e-5)


def test_abpn():
    y = _run({"network_G": {"type": "abpn_net", "dim": 8}}, (1, 8, 8, 3))
    assert y.shape == (1, 32, 32, 3)


def test_asr_resnet():
    y = _run({"network_G": {"type": "asr_resnet", "scale": 4}},
             (1, 8, 8, 3))
    assert y.shape == (1, 32, 32, 3)


def test_asr_cnn():
    y = _run({"network_G": {"type": "asr_cnn", "scale": 4}}, (1, 8, 8, 3))
    assert y.shape == (1, 32, 32, 3)


def test_rife():
    y = _run({"network_G": {"type": "rife_net", "c": 8}}, (1, 32, 32, 6))
    assert y.shape == (1, 32, 32, 3)


def test_sft_and_acd():
    import numpy as np

    from trainner_tpu.models.sft import ACDVGGBN96, SFTNet

    rng = jax.random.PRNGKey(0)
    m = SFTNet(nf=16, cond_nf=8, n_blocks=2)
    img = jnp.ones((1, 8, 8, 3))
    seg = jnp.ones((1, 32, 32, 8))
    v = m.init(rng, img, seg, train=False)
    y = m.apply(v, img, seg, train=False)
    assert y.shape == (1, 32, 32, 3)
    d = ACDVGGBN96()
    v = d.init(rng, jnp.ones((1, 96, 96, 3)), train=False)
    gan, cls = d.apply(v, jnp.ones((1, 96, 96, 3)), train=False)
    assert gan.shape == (1, 1) and cls.shape == (1, 8)


def test_edvr():
    from trainner_tpu.models.edvr import EDVR

    rng = jax.random.PRNGKey(0)
    m = EDVR(num_feat=16, num_frame=3, deformable_groups=4,
             num_extract_block=1, num_reconstruct_block=1,
             center_frame_idx=1, upscale=4)
    x = jnp.ones((1, 3, 8, 8, 3))
    v = m.init(rng, x, train=False)
    y = m.apply(v, x, train=False)
    assert y.shape == (1, 32, 32, 3)


def test_deform_conv_matches_plain_conv():
    import numpy as np

    from trainner_tpu.ops.deform_conv import modulated_deform_conv2d

    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (2, 10, 12, 8))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 16)) * 0.1
    off = jnp.zeros((2, 10, 12, 2 * 2 * 9))
    msk = jnp.ones((2, 10, 12, 2 * 9))
    y = modulated_deform_conv2d(x, off, msk, w, deformable_groups=2)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert float(jnp.abs(y - ref).max()) < 1e-5


def test_partial_conv_interior_matches_conv_and_border_renorm():
    """PartialConv (ref convolutions/partialconv2d.py:16): with an
    all-ones mask, interior outputs equal a plain conv; border outputs
    are renormalized by slide_winsize/valid-taps; fully-masked windows
    produce exact zeros."""
    import numpy as np

    from trainner_tpu.ops.partial_conv import PartialConv

    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (2, 10, 12, 4))
    pc = PartialConv(6, 3, pad=1, use_bias=False)
    v = pc.init(rng, x)
    y = pc.apply(v, x)
    assert y.shape == (2, 10, 12, 6)
    w = v["params"]["conv"]["kernel"]
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # interior: identical; border: renormalized (corner ratio 9/4)
    assert np.allclose(np.asarray(y[:, 1:-1, 1:-1]),
                       np.asarray(ref[:, 1:-1, 1:-1]), atol=1e-5)
    assert np.allclose(np.asarray(y[:, 0, 0]),
                       np.asarray(ref[:, 0, 0]) * (9.0 / 4.0), atol=1e-4)
    # a hole in the mask: windows fully inside the hole output zero
    mask = jnp.ones((2, 10, 12, 1)).at[:, 2:7, 2:9].set(0.0)
    y2 = pc.apply(v, x, mask_in=mask)
    assert float(jnp.abs(y2[:, 4, 5]).max()) == 0.0


def test_rrdb_partialconv_convtype():
    from trainner_tpu.models.networks import define_G

    net = define_G({"network_G": {"type": "rrdb_net", "nf": 8, "nb": 1,
                                  "gc": 4, "upscale": 2,
                                  "convtype": "PartialConv2D"}})
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((1, 8, 8, 3))
    v = jax.jit(lambda: net.init(rng, x, train=False))()
    y = net.apply(v, x, train=False)
    assert y.shape == (1, 16, 16, 3)
    assert jnp.all(jnp.isfinite(y))
