"""Shape + jit tests for every network family (ref has none; SURVEY §4
mandates a test pyramid: shape/jit tests for every network)."""

import jax
import jax.numpy as jnp
import pytest

from trainner_tpu.models.discriminators import (
    DiscriminatorVGG,
    MultiscaleDiscriminator,
    NLayerDiscriminator,
    PixelDiscriminator,
    UNetDiscriminator,
)
from trainner_tpu.models.rrdb import MRRDBNet, RRDBNet
from trainner_tpu.models.srresnet import SRResNet
from trainner_tpu.options import get_network_G_config
from trainner_tpu.models.networks import define_D, define_G


def _init_apply(model, x, train=False, rngs_extra=()):
    rngs = {"params": jax.random.PRNGKey(0)}
    for name in rngs_extra:
        rngs[name] = jax.random.PRNGKey(1)
    variables = model.init(rngs, x, train=train)
    out = model.apply(variables, x, train=train,
                      rngs={k: v for k, v in rngs.items() if k != "params"})
    return variables, out


def test_rrdb_shapes():
    m = RRDBNet(nf=16, nb=2, gc=8, upscale=4, gaussian_noise=False)
    x = jnp.zeros((1, 16, 16, 3))
    _, y = _init_apply(m, x)
    assert y.shape == (1, 64, 64, 3)
    assert y.dtype == jnp.float32


def test_rrdb_3x_and_plus():
    m = RRDBNet(nf=16, nb=1, gc=8, upscale=3, plus=True, gaussian_noise=False)
    x = jnp.zeros((2, 8, 8, 3))
    _, y = _init_apply(m, x)
    assert y.shape == (2, 24, 24, 3)


def test_rrdb_gaussian_noise_train_rng():
    m = RRDBNet(nf=8, nb=1, gc=4, upscale=2, gaussian_noise=True)
    x = jnp.ones((1, 8, 8, 3))
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    variables = m.init(rngs, x, train=True)
    y1 = m.apply(variables, x, train=True, rngs={"noise": jax.random.PRNGKey(2)})
    y2 = m.apply(variables, x, train=True, rngs={"noise": jax.random.PRNGKey(3)})
    assert not jnp.allclose(y1, y2)  # noise active in train
    y3 = m.apply(variables, x, train=False)
    y4 = m.apply(variables, x, train=False)
    assert jnp.allclose(y3, y4)  # deterministic in eval


def test_mrrdb_shapes():
    m = MRRDBNet(nf=8, nb=1, gc=4, upscale=4)
    _, y = _init_apply(m, jnp.zeros((1, 8, 8, 3)))
    assert y.shape == (1, 32, 32, 3)


def test_srresnet_shapes():
    m = SRResNet(nf=16, nb=2, upscale=4, norm_type=None, mode="CNA")
    _, y = _init_apply(m, jnp.zeros((1, 12, 12, 3)))
    assert y.shape == (1, 48, 48, 3)


def test_srresnet_batchnorm():
    m = SRResNet(nf=8, nb=1, upscale=2, norm_type="batch", mode="NAC")
    x = jnp.ones((2, 8, 8, 3))
    variables = m.init({"params": jax.random.PRNGKey(0)}, x, train=True)
    assert "batch_stats" in variables
    y, updates = m.apply(variables, x, train=True, mutable=["batch_stats"])
    assert y.shape == (2, 16, 16, 3)


def test_discriminator_vgg_adaptive():
    for size in (96, 128):
        m = DiscriminatorVGG(size=size, base_nf=8, norm_type=None)
        x = jnp.zeros((1, size, size, 3))
        _, y = _init_apply(m, x)
        assert y.shape == (1, 1)


def test_discriminator_vgg_feats():
    m = DiscriminatorVGG(size=128, base_nf=8, norm_type=None)
    x = jnp.zeros((1, 128, 128, 3))
    variables = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out, feats = m.apply(variables, x, train=False, return_feats=True)
    assert out.shape == (1, 1) and len(feats) == 5  # 128 -> 4: 5 stride-2 stages


def test_patchgan():
    m = NLayerDiscriminator(ndf=8, n_layers=3, norm_type=None)
    _, y = _init_apply(m, jnp.zeros((1, 64, 64, 3)))
    # 64 -> 32 -> 16 -> 8 (stride1 k4) -> 7 -> out 6? ref gives 6x6 patch for 64
    assert y.ndim == 4 and y.shape[-1] == 1


def test_multiscale():
    m = MultiscaleDiscriminator(ndf=8, n_layers=2, norm_type=None, num_D=3)
    x = jnp.zeros((1, 64, 64, 3))
    variables = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    outs = m.apply(variables, x, train=False)
    assert len(outs) == 3
    assert outs[0].shape[1] > outs[1].shape[1] > outs[2].shape[1]


def test_pixelgan():
    m = PixelDiscriminator(ndf=8, norm_type=None)
    _, y = _init_apply(m, jnp.zeros((1, 32, 32, 3)))
    assert y.shape == (1, 32, 32, 1)


def test_unet_discriminator():
    m = UNetDiscriminator(nf=8, spectral_norm=True)
    x = jnp.zeros((1, 64, 64, 3))
    variables = m.init({"params": jax.random.PRNGKey(0)}, x, train=True)
    y, _ = m.apply(variables, x, train=True, mutable=["batch_stats"])
    assert y.shape == (1, 64, 64, 1)


def test_define_G_from_options():
    cfg = get_network_G_config("esrgan-lite", 4, 128)
    cfg["nb"] = 2  # shrink for test speed
    model = define_G({"network_G": cfg}, dtype=jnp.float32)
    assert isinstance(model, RRDBNet)
    assert model.nf == 32


def test_define_D_from_options():
    from trainner_tpu.options import get_network_D_config

    cfg = get_network_D_config("discriminator_vgg", 4, 128, "rrdb_net")
    model = define_D({"network_D": cfg}, dtype=jnp.float32)
    assert isinstance(model, DiscriminatorVGG)
    assert model.size == 128


def test_rrdb_jit_compiles():
    m = RRDBNet(nf=8, nb=1, gc=4, upscale=2, gaussian_noise=False)
    x = jnp.zeros((1, 8, 8, 3))
    variables = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    @jax.jit
    def fwd(v, x):
        return m.apply(v, x, train=False)

    y = fwd(variables, x)
    assert y.shape == (1, 16, 16, 3)


def test_rrdb_bf16_compute():
    m = RRDBNet(nf=8, nb=1, gc=4, upscale=2, gaussian_noise=False,
                dtype=jnp.bfloat16)
    x = jnp.ones((1, 8, 8, 3))
    variables = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    # params stay f32
    leaf = jax.tree_util.tree_leaves(variables["params"])[0]
    assert leaf.dtype == jnp.float32
    y = m.apply(variables, x, train=False)
    assert y.dtype == jnp.float32  # output upcast
