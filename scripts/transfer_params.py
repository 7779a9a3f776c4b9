"""Initialize one network's params from another (warm-start / graft).

Equivalent of ref codes/scripts/transfer_params.py +
transfer_params_sft.py: the reference hand-copies tensors from a
pretrained SRResNet state_dict into a freshly-initialized SFT net
(kaiming*0.1 elsewhere). Here both checkpoints are flax param trees with
stable module names, so the transfer is generic: every leaf whose
flattened path exists in the source with the same shape is copied;
everything else keeps the destination's (fresh) initialization.

An optional `--map old=new` list renames path prefixes before matching
(e.g. --map fea_conv=conv0 to align differing module names).

Usage:
  python scripts/transfer_params.py pretrained.ckpt fresh_init.ckpt \
      out.ckpt [--map srresnet_prefix=sft_prefix ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}." if prefix or True
                                else k))
    else:
        out[prefix[:-1]] = tree
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("source", help="pretrained params .ckpt")
    p.add_argument("dest", help="freshly-initialized params .ckpt of "
                   "the target net")
    p.add_argument("out")
    p.add_argument("--map", action="append", default=[],
                   metavar="SRC_PREFIX=DST_PREFIX")
    args = p.parse_args()

    from trainner_tpu.utils.checkpoint import load_params, save_params

    src = _flatten(load_params(args.source))
    dst_tree = load_params(args.dest)
    renames = [m.split("=", 1) for m in args.map]

    copied, kept = 0, 0

    def visit(node, path=""):
        nonlocal copied, kept
        if isinstance(node, dict):
            return {k: visit(v, f"{path}{k}.") for k, v in node.items()}
        key = path[:-1]
        lookup = key
        for sp, dp in renames:
            if key.startswith(dp):
                lookup = sp + key[len(dp):]
                break
        cand = src.get(lookup)
        if cand is not None and tuple(cand.shape) == tuple(node.shape):
            copied += 1
            print(f"copy {lookup} -> {key} {tuple(node.shape)}")
            return cand
        kept += 1
        return node

    out = visit(dst_tree)
    save_params(out, args.out, backup=False)
    print(f"copied {copied} tensors, kept {kept} fresh -> {args.out}")


if __name__ == "__main__":
    main()
