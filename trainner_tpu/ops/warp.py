"""Bilinear warping / grid sampling ops (TPU-native, NHWC).

Equivalents of torch.nn.functional.grid_sample as used by the reference's
optical-flow warping (ref codes/models/modules/architectures/video.py:9
optical_flow_warp) and EDVR PCD alignment. Implemented as gather-based
bilinear interpolation: XLA lowers the gathers to vectorized dynamic
slices; all shapes static.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample(image: jnp.ndarray, grid: jnp.ndarray,
                align_corners: bool = True,
                padding_mode: str = "border") -> jnp.ndarray:
    """Sample NHWC `image` at normalized grid positions.

    grid: (b, h_out, w_out, 2) with (x, y) in [-1, 1]
    (torch.grid_sample convention, align_corners=True default to match ref
    video.py:92).
    """
    b, h, w, c = image.shape
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        fx = (gx + 1.0) * 0.5 * (w - 1)
        fy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        fx = ((gx + 1.0) * w - 1.0) * 0.5
        fy = ((gy + 1.0) * h - 1.0) * 0.5

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = (fx - x0).astype(image.dtype)[..., None]
    wy = (fy - y0).astype(image.dtype)[..., None]

    def clip_x(v):
        return jnp.clip(v, 0, w - 1).astype(jnp.int32)

    def clip_y(v):
        return jnp.clip(v, 0, h - 1).astype(jnp.int32)

    x0i, x1i = clip_x(x0), clip_x(x0 + 1)
    y0i, y1i = clip_y(y0), clip_y(y0 + 1)

    def gather(yy, xx):
        # per-batch gather: flatten spatial, index with y*w+x
        flat = image.reshape(b, h * w, c)
        idx = yy * w + xx  # (b, h_out, w_out)
        return jnp.take_along_axis(
            flat, idx.reshape(b, -1, 1), axis=1
        ).reshape(*idx.shape, c)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)

    if padding_mode == "zeros":
        # torch semantics: each of the 4 taps outside the image
        # contributes zero individually (partial sums at the boundary)
        def tap_mask(yy, xx):
            m = (xx >= 0) & (xx <= w - 1) & (yy >= 0) & (yy <= h - 1)
            return m[..., None].astype(image.dtype)

        v00 = v00 * tap_mask(y0, x0)
        v01 = v01 * tap_mask(y0, x0 + 1)
        v10 = v10 * tap_mask(y0 + 1, x0)
        v11 = v11 * tap_mask(y0 + 1, x0 + 1)

    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def flow_warp_vsr(image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """SOF-VSR-convention warp (ref video.py:73-79): normalized grid plus
    flow scaled by 31/(dim-1); border padding, align_corners=True.

    image: (b, h, w, c); flow: (b, h, w, 2) with (x, y) components.
    """
    b, h, w, _ = image.shape
    xs = jnp.linspace(-1.0, 1.0, w)
    ys = jnp.linspace(-1.0, 1.0, h)
    gx = jnp.broadcast_to(xs[None, None, :], (b, h, w))
    gy = jnp.broadcast_to(ys[None, :, None], (b, h, w))
    gx = gx + flow[..., 0] * (31.0 / (w - 1))
    gy = gy + flow[..., 1] * (31.0 / (h - 1))
    return grid_sample(image, jnp.stack([gx, gy], axis=-1),
                       align_corners=True, padding_mode="border")


def flow_warp_pix(image: jnp.ndarray, flow: jnp.ndarray,
                  padding_mode: str = "zeros") -> jnp.ndarray:
    """EDVR-convention warp (ref video.py:81-86): flow in pixel units added
    to the pixel grid, then normalized to [-1,1].

    image: (b, h, w, c); flow: (b, h, w, 2) with (x, y) pixel offsets.
    """
    b, h, w, _ = image.shape
    xs = jnp.arange(w, dtype=flow.dtype)
    ys = jnp.arange(h, dtype=flow.dtype)
    px = jnp.broadcast_to(xs[None, None, :], (b, h, w)) + flow[..., 0]
    py = jnp.broadcast_to(ys[None, :, None], (b, h, w)) + flow[..., 1]
    gx = 2.0 * px / max(w - 1, 1) - 1.0
    gy = 2.0 * py / max(h - 1, 1) - 1.0
    return grid_sample(image, jnp.stack([gx, gy], axis=-1),
                       align_corners=True, padding_mode=padding_mode)
