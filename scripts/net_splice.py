"""Blend or randomly splice two checkpoints of the same network.

Equivalent of ref codes/scripts/net_splice.py: `-i alpha` linearly
interpolates every tensor (same math as net_interp); `-s prob` instead
transplants whole tensors from model B with probability `prob` — a
coarse "filter transplant" useful for probing which layers carry a
behavior difference.

Usage:
  python scripts/net_splice.py a.ckpt b.ckpt out.ckpt -i 0.5
  python scripts/net_splice.py a.ckpt b.ckpt out.ckpt -s 0.3 --seed 0
"""

from __future__ import annotations

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("model_a")
    p.add_argument("model_b")
    p.add_argument("out")
    p.add_argument("-i", "--interpolate", type=float, default=None,
                   help="linear interpolation alpha toward model B")
    p.add_argument("-s", "--splice", type=float, default=None,
                   help="probability of taking each tensor from model B")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    if (args.interpolate is None) == (args.splice is None):
        raise SystemExit("pass exactly one of -i/--interpolate or "
                         "-s/--splice")

    import jax

    from trainner_tpu.utils.checkpoint import load_params, save_params

    a = load_params(args.model_a)
    b = load_params(args.model_b)
    if args.interpolate is not None:
        al = args.interpolate
        out = jax.tree.map(lambda x, y: (1.0 - al) * x + al * y, a, b)
        print(f"interpolated alpha={al}")
    else:
        rng = random.Random(args.seed)
        taken = [0, 0]

        def pick(x, y):
            use_b = rng.random() < args.splice
            taken[use_b] += 1
            return y if use_b else x

        out = jax.tree.map(pick, a, b)
        print(f"spliced: {taken[0]} tensors from A, {taken[1]} from B")
    save_params(out, args.out, backup=False)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
