"""Loss stack tests: pixel criteria, SSIM, regularizers, GAN forms,
GeneratorLoss builder from option keys (ref models/losses.py surface)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trainner_tpu.losses import (
    AdversarialLoss,
    GeneratorLoss,
    gan_loss,
    get_pixel_criterion,
    ms_ssim,
    ssim,
)
from trainner_tpu.losses import basic, regularizers as reg


@pytest.fixture(scope="module")
def pair():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.uniform(k1, (2, 32, 32, 3))
    y = jax.random.uniform(k2, (2, 32, 32, 3))
    return x, y


def test_pixel_criteria(pair):
    x, y = pair
    for name in ("l1", "l2", "cb", "elastic", "relativel1", "l1cosinesim",
                 "clipl1", "fro", "multiscale-l1"):
        fn = get_pixel_criterion(name)
        v = fn(x, y)
        assert jnp.isfinite(v) and v.shape == ()
        assert float(fn(x, x)) < float(v) + 1e-6  # identity <= mismatch


def test_pixel_criterion_unknown():
    with pytest.raises(NotImplementedError):
        get_pixel_criterion("bogus")


def test_ssim_identity(pair):
    x, _ = pair
    assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-4)


def test_ssim_vs_skimage_reference(pair):
    x, y = pair
    ours = float(ssim(x, y))
    assert 0.0 < ours < 0.5  # random pairs are dissimilar


def test_ms_ssim_range():
    k = jax.random.PRNGKey(1)
    x = jax.random.uniform(k, (1, 192, 192, 3))
    noise = 0.05 * jax.random.normal(jax.random.PRNGKey(2), x.shape)
    y = jnp.clip(x + noise, 0, 1)
    v = float(ms_ssim(x, y))
    assert 0.5 < v < 1.0


def test_regularizers_finite(pair):
    x, y = pair
    for v in (reg.hfen(x, y), reg.tv_loss(x), reg.tv_loss(x, "dtv", 2),
              reg.gradient_loss(x, y), reg.gradient_loss(x, y, four_d=True),
              reg.spl_loss(x, y), reg.fft_loss(x, y), reg.overflow_loss(x * 2),
              reg.range_loss(x * 3), reg.color_loss(x, y),
              reg.average_loss(x, y)):
        assert jnp.isfinite(v)


def test_overflow_zero_inside_range(pair):
    x, _ = pair
    assert float(reg.overflow_loss(x)) == 0.0  # uniform [0,1] never overflows


def test_gan_loss_forms():
    logits = jnp.array([0.5, -1.0, 2.0])
    for gt in ("vanilla", "lsgan", "hinge", "wgan-gp"):
        for real in (True, False):
            v = gan_loss(gt, logits, real, is_disc=True)
            assert jnp.isfinite(v)
    with pytest.raises(NotImplementedError):
        gan_loss("bogus", logits, True)


def test_adversarial_relativistic(pair):
    fake, real = pair
    adv = AdversarialLoss(gan_type="vanilla", gan_weight=5e-3,
                          form="relativistic")

    def d_fn(x):
        return jnp.mean(x, axis=(1, 2, 3), keepdims=False)[:, None] * 10

    lg = adv.generator_loss(d_fn, fake, real)
    ld, logs = adv.discriminator_loss(d_fn, fake, real)
    assert jnp.isfinite(lg) and jnp.isfinite(ld)
    assert set(logs) >= {"l_d_real", "l_d_fake", "D_real", "D_fake"}


def test_adversarial_conditional(pair):
    fake, real = pair
    cond = jnp.zeros_like(fake)
    adv = AdversarialLoss(gan_type="lsgan", gan_weight=1.0, form="standard",
                          conditional=True)

    def d_fn(x):
        assert x.shape[-1] == 6  # condition concatenated
        return jnp.mean(x, axis=(1, 2))

    lg = adv.generator_loss(d_fn, fake, real, condition=cond)
    assert jnp.isfinite(lg)


def test_generator_loss_builder(pair):
    sr, hr = pair
    opt = {
        "train": {
            "pixel_criterion": "l1", "pixel_weight": 1e-2,
            "tv_type": "normal", "tv_weight": 1e-5, "tv_norm": 1,
            "grad_type": "grad-4d-l1", "grad_weight": 4e-1,
            "hfen_criterion": "l1", "hfen_weight": 1e-6,
            "ssim_type": "ssim", "ssim_weight": 0.1,
            "of_type": "overflow", "of_weight": 0.2,
            "range_weight": 1.0,
            "fft_type": "fft", "fft_weight": 0.1,
        },
        "path": {},
    }
    gl = GeneratorLoss(opt)
    total, logs = gl(sr, hr)
    assert jnp.isfinite(total)
    for key in ("l_g_pix", "l_g_tv", "l_g_grad", "l_g_HFEN", "l_g_ssim",
                "l_g_of", "l_g_range", "l_g_fft"):
        assert key in logs, key


def test_generator_loss_selectors(pair):
    sr, hr = pair
    opt = {"train": {"pixel_criterion": "l1", "pixel_weight": 1,
                     "ssim_type": "ssim", "ssim_weight": 1}, "path": {}}
    gl = GeneratorLoss(opt)
    _, logs_all = gl(sr, hr)
    _, logs_pix = gl(sr, hr, selectors=["pix"])
    assert "l_g_ssim" in logs_all and "l_g_ssim" not in logs_pix


def test_generator_loss_jit(pair):
    sr, hr = pair
    opt = {"train": {"pixel_criterion": "l1", "pixel_weight": 1e-2},
           "path": {}}
    gl = GeneratorLoss(opt)

    @jax.jit
    def f(a, b):
        return gl(a, b)[0]

    assert jnp.isfinite(f(sr, hr))


def test_perceptual_random_init(pair):
    """Perceptual loss runs without pretrained weights (random VGG)."""
    from trainner_tpu.losses.perceptual import PerceptualLoss

    sr, hr = pair
    pl = PerceptualLoss(layer_weights={"conv2_2": 1.0}, dtype=jnp.float32)
    v = pl(sr, hr)
    assert jnp.isfinite(v)
    assert float(pl(sr, sr)) == pytest.approx(0.0, abs=1e-6)


def test_contextual_loss(pair):
    from trainner_tpu.losses.contextual import ContextualLoss

    sr, hr = pair
    cx = ContextualLoss(layers_weights={"conv2_2": 1.0}, max_points=256,
                        dtype=jnp.float32)
    v = cx(sr, hr)
    assert jnp.isfinite(v)
    assert float(cx(sr, sr)) < float(v)


def test_generator_loss_full_option_surface():
    """Every loss key from the reference train-option surface builds,
    yields a finite value AND a finite gradient (ref losses.py:34-161)."""
    from trainner_tpu.losses.generator_loss import GeneratorLoss

    opt = {"train": {
        "pixel_criterion": "l1", "pixel_weight": 1e-2,
        "feature_criterion": "l1", "feature_weight": 1.0,
        "cx_weight": 0.5,
        "hfen_criterion": "l1", "hfen_weight": 1e-6,
        "grad_type": "grad-4d-l1", "grad_weight": 1e-3,
        "tv_type": "tv", "tv_norm": 1, "tv_weight": 1e-5,
        "ssim_type": "ms-ssim", "ssim_weight": 0.2,
        "spl_type": "spl", "spl_weight": 0.1,
        "fft_type": "fft", "fft_weight": 1e-4,
        "of_type": "overflow", "of_weight": 0.2,
        "range_weight": 0.1,
        "color_criterion": "l1", "color_weight": 0.1,
        "avg_criterion": "l1", "avg_weight": 0.1,
        "ms_criterion": "multiscale-l1", "ms_weight": 0.1,
        "fdpl_weight": 1e-3,
    }}
    gl = GeneratorLoss(opt, device_dtype=jnp.float32)
    assert len(gl.entries) >= 13, [e.name for e in gl.entries]

    rng = jax.random.PRNGKey(0)
    sr = jax.random.uniform(rng, (2, 32, 32, 3))
    hr = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))

    def loss_fn(x):
        total, logs = gl(x, hr)
        return total

    val, grad = jax.value_and_grad(loss_fn)(sr)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad)))
    _, logs = gl(sr, hr)
    for k, v in logs.items():
        assert np.isfinite(float(v)), k


def test_perceptual_feature_networks(pair):
    """feature_network selects the extractor: vgg19 / resnet101 / minc
    (ref networks.py define_F:316)."""
    import jax.numpy as jnp

    from trainner_tpu.losses.perceptual import PerceptualLoss

    x, y = pair
    x, y = jnp.asarray(x[:, :32, :32]), jnp.asarray(y[:, :32, :32])
    for arch in ("resnet101", "minc"):
        pl = PerceptualLoss(arch=arch, dtype=jnp.float32)
        v = float(pl(x, y))
        assert np.isfinite(v) and v >= 0.0, (arch, v)


def test_generator_loss_feature_network_option(pair):
    import jax
    import jax.numpy as jnp

    from trainner_tpu.losses.generator_loss import GeneratorLoss

    x, y = pair
    opt = {"is_train": True, "train": {
        "feature_weight": 1.0, "feature_criterion": "l1",
        "feature_network": "resnet101"}}
    gl = GeneratorLoss(opt, device_dtype=jnp.float32)
    total, logs = gl(jnp.asarray(x[:, :32, :32]),
                     jnp.asarray(y[:, :32, :32]))
    assert np.isfinite(float(total)) and "l_g_fea" in logs
