"""DNI network interpolation: blend two checkpoints of the same net.

Equivalent of ref codes/scripts/net_interp.py (README.md:86-95): given a
PSNR-oriented and a GAN-oriented model, produce intermediate models
  theta = alpha * theta_gan + (1 - alpha) * theta_psnr.

Works on our .ckpt (flax msgpack) param files.

Usage:
  python scripts/net_interp.py psnr.ckpt gan.ckpt out.ckpt --alpha 0.8
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("model_a", help="base model (alpha=0 end, e.g. PSNR)")
    p.add_argument("model_b", help="target model (alpha=1 end, e.g. GAN)")
    p.add_argument("out")
    p.add_argument("--alpha", type=float, default=0.8)
    args = p.parse_args()

    import jax

    from trainner_tpu.utils.checkpoint import load_params, save_params

    a = load_params(args.model_a)
    b = load_params(args.model_b)
    alpha = args.alpha
    out = jax.tree.map(lambda x, y: (1.0 - alpha) * x + alpha * y, a, b)
    save_params(out, args.out, backup=False)
    print(f"interpolated (alpha={alpha}) -> {args.out}")


if __name__ == "__main__":
    main()
