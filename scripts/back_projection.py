"""Iterative back-projection post-processing for SR outputs.

TPU-native equivalent of the reference's MATLAB scripts
(ref codes/scripts/back_projection/backprojection.m, main_bp.m,
main_reverse_filter.m), batched and jitted over our MATLAB-parity
resizer (ops/imresize, bicubic antialiased — the same `imresize`
those scripts call):

  bp  (backprojection.m):  im_h += conv(up(im_l - down(im_h)), p)
      with p = normalized square of a 5x1 sigma-1 gaussian (fspecial)
  if  (main_reverse_filter.m): im_out += up(im_l) - up(down(im_out))
      ("iterative refinement" / reverse filtering)

Usage:
  python scripts/back_projection.py --lr LR_DIR --sr SR_DIR --out OUT \
      [--mode bp|if] [--iters 20] [--scale 4]

Pairs files by name; images read/written as 8-bit PNG like the
reference (im2double / imwrite round-trip).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _gauss_p() -> np.ndarray:
    """fspecial('gaussian', 5, 1) squared and renormalized."""
    g = np.arange(5.0) - 2.0
    k1 = np.exp(-0.5 * g * g)
    k = np.outer(k1, k1)
    k /= k.sum()
    k = k * k
    return (k / k.sum()).astype(np.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lr", required=True)
    ap.add_argument("--sr", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--mode", choices=("bp", "if"), default="bp")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--scale", type=int, default=4)
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from trainner_tpu.ops.imresize import imresize

    os.makedirs(args.out, exist_ok=True)
    p = jnp.asarray(_gauss_p())[:, :, None, None]

    def conv_p(x):
        c = x.shape[-1]
        k = jnp.tile(p, (1, 1, 1, c))
        dn = jax.lax.conv_dimension_numbers(
            x.shape, (5, 5, 1, c), ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", (1, 1), (1, 1), dn,
            feature_group_count=c)

    def step_bp(sr, lr):
        lh, lw = lr.shape[1:3]
        hh, hw = sr.shape[1:3]
        down = imresize(sr, out_shape=(lh, lw), kernel="cubic")
        diff = imresize(lr - down, out_shape=(hh, hw), kernel="cubic")
        return sr + conv_p(diff)

    def step_if(sr, j, s):
        down = imresize(sr, 1.0 / s, kernel="cubic")
        up = imresize(down, float(s), kernel="cubic")
        return sr + (j - up)

    @jax.jit
    def run_bp(sr, lr):
        def body(_, v):
            return step_bp(v, lr)
        return jax.lax.fori_loop(0, args.iters, body, sr)

    @jax.jit
    def run_if(sr, lr):
        j = imresize(lr, float(args.scale), kernel="cubic")
        def body(_, v):
            return step_if(v, j, args.scale)
        return jax.lax.fori_loop(0, args.iters, body, sr)

    names = sorted(os.path.basename(f)
                   for f in glob.glob(os.path.join(args.sr, "*.png")))
    for name in names:
        lr_path = os.path.join(args.lr, name)
        if not os.path.exists(lr_path):
            print(f"skip {name}: no LR pair", file=sys.stderr)
            continue
        lr = cv2.imread(lr_path).astype(np.float32)[None] / 255.0
        sr = cv2.imread(os.path.join(args.sr, name)
                        ).astype(np.float32)[None] / 255.0
        fn = run_bp if args.mode == "bp" else run_if
        out = np.asarray(fn(jnp.asarray(sr), jnp.asarray(lr)))[0]
        cv2.imwrite(os.path.join(args.out, name),
                    np.clip(np.round(out * 255.0), 0, 255
                            ).astype(np.uint8))
        print(name)


if __name__ == "__main__":
    main()
