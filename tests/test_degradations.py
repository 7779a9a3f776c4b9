"""Tests for the on-device batched degradation ops + pipeline assembly
(SURVEY.md §2.4 equivalents)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trainner_tpu.data.pipeline import BatchDegrader, get_unpaired_params
from trainner_tpu.ops import degradations as D

RNG = jax.random.PRNGKey(0)


def test_gaussian_kernels_normalized():
    k = D.gaussian_kernels(RNG, 4, 21, (0.5, 3.0))
    assert k.shape == (4, 21, 21)
    assert np.allclose(np.asarray(jnp.sum(k, axis=(1, 2))), 1.0, atol=1e-5)


def test_aniso_kernels_differ_from_iso():
    iso = D.gaussian_kernels(RNG, 2, 21, (2.0, 2.0), iso_prob=1.0)
    aniso = D.gaussian_kernels(RNG, 2, 21, (0.5, 0.5), iso_prob=0.0,
                               sigma_y_range=(4.0, 4.0))
    # anisotropic: different variance along x vs y
    gx = jnp.arange(21.0) - 10
    var_x = jnp.sum(aniso[0].sum(0) * gx ** 2)
    var_y = jnp.sum(aniso[0].sum(1) * gx ** 2)
    assert float(jnp.abs(var_x - var_y)) > 0.5
    var_x_i = jnp.sum(iso[0].sum(0) * gx ** 2)
    var_y_i = jnp.sum(iso[0].sum(1) * gx ** 2)
    assert float(jnp.abs(var_x_i - var_y_i)) < 1e-3


def test_apply_kernels_identity():
    x = jax.random.uniform(RNG, (2, 16, 16, 3))
    ident = jnp.zeros((2, 5, 5)).at[:, 2, 2].set(1.0)
    y = D.apply_kernels(x, ident)
    assert np.allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_apply_kernels_smooths():
    x = jax.random.uniform(RNG, (2, 32, 32, 3))
    k = D.gaussian_kernels(RNG, 2, 13, (2.0, 2.0))
    y = D.apply_kernels(x, k)
    assert float(jnp.std(y)) < float(jnp.std(x))


def test_gaussian_noise_scales():
    x = jnp.full((4, 32, 32, 3), 0.5)
    y = D.gaussian_noise(RNG, x, (10.0, 10.0), gray_prob=0.0,
                         mc_prob=0.0)
    resid = np.asarray(y - x)
    assert abs(resid.std() - 10.0 / 255.0) < 2e-3


def test_salt_pepper_bounds():
    x = jnp.full((2, 32, 32, 3), 0.5)
    y = D.salt_pepper_noise(RNG, x, (0.05, 0.05))
    vals = np.unique(np.asarray(y))
    assert set(np.round(vals, 3)).issubset({0.0, 0.5, 1.0})


def test_jpeg_quality_ordering():
    # smooth-ish content: pixel noise is the worst case for the 4:2:0
    # chroma subsampling (matching libjpeg) so pure-uniform noise would
    # show a large constant chroma error at any quality
    x = jax.random.uniform(RNG, (1, 64, 64, 3))
    k = D.gaussian_kernels(RNG, 1, 9, (1.5, 1.5))
    x = jnp.clip(D.apply_kernels(x, k), 0.0, 1.0)
    hi = D.jpeg_compress(RNG, x, quality=jnp.array([95.0]))
    lo = D.jpeg_compress(RNG, x, quality=jnp.array([10.0]))
    err_hi = float(jnp.abs(hi - x).mean())
    err_lo = float(jnp.abs(lo - x).mean())
    assert err_hi < err_lo
    assert err_hi < 0.05


def test_jpeg_flat_image_near_lossless():
    x = jnp.full((1, 32, 32, 3), 0.5)
    y = D.jpeg_compress(RNG, x, quality=jnp.array([90.0]))
    assert float(jnp.abs(y - x).max()) < 0.02


def test_unsharp_sharpens():
    # unsharp mask should increase local contrast of a soft edge
    ramp = jnp.linspace(0.2, 0.8, 32)
    x = jnp.broadcast_to(ramp[None, None, :, None], (1, 32, 32, 3))
    y = D.unsharp_mask(RNG, x, amount_range=(1.0, 1.0))
    grad_x = float(jnp.abs(jnp.diff(x[0, 16, :, 0])).max())
    grad_y = float(jnp.abs(jnp.diff(y[0, 16, :, 0])).max())
    assert grad_y >= grad_x


def test_get_unpaired_params_split():
    opt = {"lr_blur": True, "blur_prob": 0.7, "lr_blur_types": ["iso"],
           "lr_noise": True, "lr_noise_types": ["gaussian"],
           "hr_noise": True, "hr_noise_types": ["gaussian"],
           "hr_unsharp_mask": True, "hr_rand_unsharp": 1,
           "shuffle_degradations": True}
    lr_p, hr_p = get_unpaired_params(opt)
    assert lr_p["kind"] == "lr" and hr_p["kind"] == "hr"
    assert lr_p["blur"]["prob"] == 0.7
    assert "noise" in hr_p and "unsharp" in hr_p
    assert lr_p.get("random_shuffle") is True


def test_batch_degrader_full_pipeline():
    opt = {"scale": 4,
           "lr_blur": True, "blur_prob": 1.0,
           "lr_blur_types": ["iso", "sinc"],
           "lr_downscale": True, "lr_downscale_types": [1, 2],
           "resize_strat": "in",
           "lr_noise": True, "lr_noise_types": ["gaussian", "jpeg"],
           "aug_configs": {}}
    deg = BatchDegrader(opt, "lr")
    x = jax.random.uniform(RNG, (2, 64, 64, 3))
    y = deg(RNG, x)
    assert y.shape == (2, 16, 16, 3)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0
    y2 = deg(jax.random.PRNGKey(9), x)
    assert float(jnp.abs(y - y2).max()) > 1e-6  # randomness applied


def test_batch_degrader_matlab_resize_code():
    opt = {"scale": 2, "lr_downscale": True, "resize_strat": "in",
           "lr_downscale_types": [777]}  # 777 = MATLAB cubic (ref codes)
    deg = BatchDegrader(opt, "lr")
    x = jax.random.uniform(RNG, (1, 32, 32, 3))
    y = deg(RNG, x)
    assert y.shape == (1, 16, 16, 3)
    # matches the MATLAB-parity resizer directly
    from trainner_tpu.ops.imresize import imresize

    ref = jnp.clip(imresize(x, out_shape=(16, 16), kernel="cubic"), 0, 1)
    # the pipeline carries the reference's uint8 wire between stages
    # (augmennt transforms consume/emit uint8) — compare post-round
    ref = jnp.round(ref * 255.0) / 255.0
    assert float(jnp.abs(y - ref).max()) < 1e-5


def test_hr_degrader_keeps_size():
    opt = {"scale": 4, "hr_noise": True, "hr_noise_types": ["gaussian"]}
    deg = BatchDegrader(opt, "hr")
    x = jax.random.uniform(RNG, (2, 32, 32, 3))
    y = deg(RNG, x)
    assert y.shape == x.shape


def test_camera_noise_smooth_roundtrip():
    from trainner_tpu.ops.degradations import camera_noise

    x = jnp.broadcast_to(jnp.linspace(0.2, 0.8, 32)[None, :, None, None],
                         (1, 32, 32, 3)).transpose(0, 2, 1, 3)
    # the full ISP keeps a persistent rgb_gain brightness shift and
    # tonemap/CCM roundtrips (ref camera.py unprocess/process), so even
    # noiseless output differs from the input by a global shift; smooth
    # content should survive up to that shift
    y = camera_noise(RNG, x, shot_range=(1e-12, 2e-12),
                     gain_range=(1.0, 1.0))
    gain = float(jnp.mean(y) / jnp.mean(x))
    assert float(jnp.abs(y / gain - x).mean()) < 0.04
    y2 = camera_noise(RNG, x, shot_range=(1e-2, 1.1e-2))
    assert float(jnp.abs(y2 - y).mean()) > 1e-3  # noise applied


def test_noise_stage_camera_and_superpixels():
    opt = {"scale": 1, "lr_noise": True,
           "lr_noise_types": ["camera", "superpixels"],
           "aug_configs": {"superpixels": {"n_segments": 16}}}
    deg = BatchDegrader(opt, "lr")
    x = jax.random.uniform(RNG, (2, 32, 32, 3))
    y = deg(RNG, x)
    assert y.shape == x.shape
    assert float(jnp.abs(y - x).max()) > 1e-3


def test_kernel_pool_and_noise_patches(tmp_path):
    import cv2

    from trainner_tpu.data.kernels import (apply_kernel_pool,
                                           apply_noise_patches,
                                           load_kernel_pool,
                                           load_noise_patches)

    # kernel pool from .npy files
    kd = tmp_path / "kernels"
    kd.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        k = rng.random((13, 13))
        np.save(str(kd / f"k{i}.npy"), k / k.sum())
    bank = load_kernel_pool(str(kd), kernel_size=21)
    assert bank.shape == (3, 21, 21)
    assert np.allclose(bank.sum(axis=(1, 2)), 1.0, atol=1e-5)

    x = jax.random.uniform(RNG, (2, 32, 32, 3))
    y = apply_kernel_pool(RNG, x, bank, scale=2)
    assert y.shape == (2, 16, 16, 3)

    # noise patches from images
    nd = tmp_path / "noise"
    nd.mkdir()
    for i in range(2):
        img = rng.integers(100, 156, (64, 64, 3), np.uint8)
        cv2.imwrite(str(nd / f"n{i}.png"), img)
    patches = load_noise_patches(str(nd), patch_size=16, n_patches=8)
    assert patches.shape[1:] == (16, 16, 3)
    assert abs(patches.mean()) < 1e-3  # zero-mean
    z = apply_noise_patches(RNG, x, patches)
    assert z.shape == x.shape
    assert float(jnp.abs(z - x).max()) > 1e-4


def test_pipeline_realistic_kernel_999(tmp_path):
    from trainner_tpu.data.pipeline import BatchDegrader

    kd = tmp_path / "kernels"
    kd.mkdir()
    rng = np.random.default_rng(1)
    for i in range(2):
        k = rng.random((13, 13))
        np.save(str(kd / f"k{i}.npy"), k / k.sum())
    opt = {"scale": 2, "lr_downscale": True, "resize_strat": "in",
           "lr_downscale_types": [999, 2],
           "dataroot_kernels": str(kd)}
    deg = BatchDegrader(opt, "lr")
    assert deg.kernel_bank is not None
    x = jax.random.uniform(RNG, (2, 32, 32, 3))
    y = deg(RNG, x)
    assert y.shape == (2, 16, 16, 3)


def test_device_jpeg_tracks_real_jpeg():
    """DCT-approx JPEG should track real libjpeg closely in PSNR terms
    across qualities (statistical parity gate, SURVEY.md §7.3 item 1)."""
    from trainner_tpu.data.host_degradations import jpeg_compress_exact
    from trainner_tpu.utils.metrics import calculate_psnr

    rng = np.random.default_rng(0)
    base = rng.random((64, 64, 3)).astype(np.float32)
    # smooth the test image a bit (pure noise is JPEG-hostile)
    from trainner_tpu.ops.degradations import apply_kernels, \
        gaussian_kernels

    sm = np.asarray(apply_kernels(
        jnp.asarray(base[None]), gaussian_kernels(RNG, 1, 9, (1.0, 1.0))
    ))[0]
    for q in (30, 60, 90):
        ours = np.asarray(D.jpeg_compress(
            RNG, jnp.asarray(sm[None]), quality=jnp.array([float(q)])))[0]
        real = jpeg_compress_exact(sm, q)
        p_ours = calculate_psnr(ours * 255, sm * 255)
        p_real = calculate_psnr(real * 255, sm * 255)
        # same degradation severity within a few dB
        assert abs(p_ours - p_real) < 6.0, (q, p_ours, p_real)


def test_host_exact_ops_run():
    from trainner_tpu.data import host_degradations as H

    rng = np.random.default_rng(1)
    img = rng.random((32, 32, 3)).astype(np.float32)
    assert H.jpeg_compress_exact(img, 50).shape == img.shape
    assert H.webp_compress_exact(img, 50).shape == img.shape
    assert H.gaussian_blur_exact(img, 5, 1.0).shape == img.shape
    assert H.motion_blur_exact(img, 7, 30.0).shape == img.shape
    assert H.gaussian_noise_exact(img, 10.0).shape == img.shape
    assert H.clahe_exact(img).shape == img.shape


def test_rotate_batch_identity_and_pair():
    from trainner_tpu.ops.geometry import rotate_batch, rotate_pair

    x = jax.random.uniform(RNG, (2, 32, 32, 3))
    y = rotate_batch(RNG, x, max_deg=0.0)  # zero rotation -> identity
    assert float(jnp.abs(y - x).max()) < 1e-4
    hr = jax.random.uniform(RNG, (2, 32, 32, 3))
    lr = jax.random.uniform(jax.random.PRNGKey(5), (2, 8, 8, 3))
    hr2, lr2 = rotate_pair(jax.random.PRNGKey(6), hr, lr, max_deg=30.0)
    assert hr2.shape == hr.shape and lr2.shape == lr.shape
    assert float(jnp.abs(hr2 - hr).max()) > 1e-3  # actually rotated


def test_perspective_batch():
    from trainner_tpu.ops.geometry import perspective_batch

    x = jax.random.uniform(RNG, (2, 32, 32, 3))
    y = perspective_batch(jax.random.PRNGKey(7), x, distortion=0.2)
    assert y.shape == x.shape
    assert float(jnp.abs(y - x).max()) > 1e-3
    # near-zero distortion -> near identity
    y0 = perspective_batch(jax.random.PRNGKey(8), x, distortion=1e-6)
    assert float(jnp.abs(y0 - x).max()) < 1e-3


def test_dither_family():
    from trainner_tpu.ops import degradations as D

    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (2, 16, 16, 3))
    for kind in ("bayer", "fs", "rnd", "bin", "avg"):
        for bw in (False, True):
            y = D.dither_batch(rng, x, kind=kind, bw=bw)
            assert y.shape == x.shape, (kind, bw)
            vals = np.unique(np.asarray(y))
            assert vals.min() >= 0.0 and vals.max() <= 1.0
            if kind != "avg":
                # 1-bit dither -> binary output
                assert set(np.round(vals, 5)).issubset({0.0, 1.0}), kind
            if bw:
                assert np.allclose(np.asarray(y[..., 0]),
                                   np.asarray(y[..., 1]))


def test_kmeans_quantize_reduces_palette():
    from trainner_tpu.ops import degradations as D

    rng = jax.random.PRNGKey(1)
    x = jax.random.uniform(rng, (2, 24, 24, 3))
    y = D.kmeans_quantize(rng, x, n_colors=8, iters=6, sample=256)
    assert y.shape == x.shape
    for i in range(2):
        pal = np.unique(np.asarray(y[i]).reshape(-1, 3), axis=0)
        assert len(pal) <= 8
    # 8 colors must beat the trivial 1-color (global mean) palette
    err = float(jnp.mean((x - y) ** 2))
    base = float(jnp.mean((x - jnp.mean(x, axis=(1, 2),
                                        keepdims=True)) ** 2))
    assert err < base * 0.7, (err, base)


def test_noise_stage_dispatch_new_types():
    from trainner_tpu.data.pipeline import _noise_stage

    rng = jax.random.PRNGKey(2)
    x = jax.random.uniform(rng, (2, 16, 16, 3))
    for types in (["fs_dither"], ["bayer_bw_dither"], ["km_quantize"],
                  ["simplequantize"], ["som_quantize"]):
        fn = _noise_stage(types, {}, 1.0)
        y = jax.jit(fn)(rng, x)
        assert y.shape == x.shape
        assert bool(jnp.all(jnp.isfinite(y)))


def test_median_blur_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    img = rng.random((40, 48, 3)).astype(np.float32)
    for k in (3, 5):
        ours = np.asarray(D.median_blur(jnp.asarray(img[None]), k))[0]
        ref = cv2.medianBlur((img * 255).astype(np.uint8),
                             k).astype(np.float32) / 255.0
        # cv2 works on uint8 -> quantization bound 1/255
        err = np.abs(ours[2:-2, 2:-2] - ref[2:-2, 2:-2]).max()
        assert err <= 1.0 / 255.0 + 1e-6, (k, err)


def test_bilateral_blur_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    img = rng.random((40, 48, 3)).astype(np.float32)
    ours = np.asarray(D.bilateral_blur(jnp.asarray(img[None]),
                                       9, 75, 75))[0]
    ref = cv2.bilateralFilter(img, 9, 75 / 255.0, 75)
    err = np.abs(ours[5:-5, 5:-5] - ref[5:-5, 5:-5]).max()
    assert err < 1e-5, err


def test_clahe_increases_local_contrast():
    rng = np.random.default_rng(1)
    # low-contrast image: values compressed in [0.4, 0.6]
    # 128px / 8x8 grid -> 16px tiles (256 px each) so the clip limit
    # quantization (cv2: clip*area/bins) actually distinguishes levels
    img = (0.4 + 0.2 * rng.random((2, 128, 128, 3))).astype(np.float32)
    out = np.asarray(D.clahe_batch(jnp.asarray(img), clip_limit=4.0))
    assert out.shape == img.shape
    assert out.std() > img.std() * 1.5  # equalization spreads values
    # near-identity when clip_limit ~ 1 (no equalization allowed)
    out1 = np.asarray(D.clahe_batch(jnp.asarray(img), clip_limit=1.0))
    assert np.abs(out1 - img).mean() < np.abs(out - img).mean()


def test_som_quantize_reduces_palette():
    rng = np.random.default_rng(2)
    img = rng.random((1, 32, 32, 3)).astype(np.float32)
    q = np.asarray(D.som_quantize(jax.random.PRNGKey(0),
                                  jnp.asarray(img), n_colors=8))
    colors = np.unique(q.reshape(-1, 3), axis=0)
    assert len(colors) <= 8
    # quantization error bounded (nodes trained on the image itself)
    assert np.abs(q - img).mean() < 0.15


def test_per_sample_shuffle_orders_differ_within_batch():
    """TRUE per-sample order semantics (ref aug_pipeline:1748 shuffles
    the transform list per sample): two noncommuting injected stages
    A(x)=x*0.5 and B(x)=x+0.25 must yield BOTH composition results
    (A.B -> 0.375 on zeros after B first, B.A -> 0.25... distinct
    values) across samples of ONE batch in ONE jitted call."""
    opt = {"scale": 4, "lr_noise": True, "lr_noise_types": ["gaussian"],
           "shuffle_degradations": True, "aug_configs": {}}
    deg = BatchDegrader(opt, "lr")
    deg.stages = [("a", lambda rng, x: x * 0.5),
                  ("b", lambda rng, x: x + 0.25)]
    deg._resize_finals = []
    deg._comp_finals = []
    deg._jitted = {}
    assert deg.shuffle
    x = jnp.zeros((64, 8, 8, 3))
    y = np.asarray(deg(jax.random.PRNGKey(0), x))
    per_sample = np.round(y.mean(axis=(1, 2, 3)), 3)
    vals = sorted(set(per_sample.tolist()))
    # a-then-b: (0*0.5)+0.25 = 0.25 ; b-then-a: (0+0.25)*0.5 = 0.125
    assert len(vals) == 2, vals
    assert abs(vals[0] - 0.125) < 2e-3 and abs(vals[1] - 0.25) < 2e-3
    # both orders well represented within the batch (p=0.5 each)
    n_hi = int((per_sample > 0.18).sum())
    assert 16 <= n_hi <= 48, n_hi


def test_device_webp_is_real_codec():
    """`compression: webp` on the device path must exercise the REAL
    webp encoder (host callback), bit-exact with the per-sample host
    round-trip at the same drawn qualities (round-3 VERDICT missing #5:
    VP8 artifacts != 8x8-DCT artifacts)."""
    import jax

    from trainner_tpu.data.host_degradations import webp_compress_exact

    rng = jax.random.PRNGKey(3)
    x = jax.random.uniform(jax.random.PRNGKey(4), (3, 32, 32, 3))
    y = jax.jit(lambda r, v: D.codec_compress_host(
        r, v, fmt="webp", quality_range=(30.0, 95.0)))(rng, x)
    # reproduce the op's per-sample quality draws
    q = np.asarray(jax.random.uniform(rng, (3,), minval=30.0,
                                      maxval=95.0))
    x8 = np.clip(np.round(np.asarray(x) * 255.0), 0, 255).astype(np.uint8)
    for i in range(3):
        ref = webp_compress_exact(x8[i].astype(np.float32) / 255.0,
                                  int(round(float(q[i]))))
        ref8 = np.clip(np.round(ref * 255.0), 0, 255).astype(np.uint8)
        got8 = np.clip(np.round(np.asarray(y[i]) * 255.0),
                       0, 255).astype(np.uint8)
        np.testing.assert_array_equal(got8, ref8)
    # and it is NOT the DCT approximation
    approx = D.jpeg_compress(rng, x, quality=jnp.asarray(q))
    assert float(jnp.abs(approx - y).max()) > 1e-3


def test_pipeline_webp_routes_to_host_codec(monkeypatch):
    """The noise-stage factory maps webp -> the host-callback codec by
    default, and back to the DCT approximation under
    TRAINNER_DEVICE_WEBP=approx."""
    from functools import partial as _p

    from trainner_tpu.data.pipeline import _noise_stage

    calls = []
    orig = D.codec_compress_host

    def spy(rng, x, **kw):
        calls.append(kw.get("fmt"))
        return orig(rng, x, **kw)

    monkeypatch.setattr(D, "codec_compress_host", spy)
    stage = _noise_stage(["webp"], {"webp": {"p": 1.0}}, prob=1.0)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    stage(jax.random.PRNGKey(1), x)
    assert calls == ["webp"]

    monkeypatch.setenv("TRAINNER_DEVICE_WEBP", "approx")
    calls.clear()
    stage = _noise_stage(["webp"], {"webp": {"p": 1.0}}, prob=1.0)
    stage(jax.random.PRNGKey(1), x)
    assert calls == []
