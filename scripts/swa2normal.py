"""Extract a plain generator checkpoint from an SWA training state.

Equivalent of ref codes/scripts/swa2normal.py: the reference strips the
torch `AveragedModel` wrapper (`n_averaged` key + `module.` prefixes);
here SWA lives inside the training state pytree (`swa_params`, see
trainner_tpu/train/state.py), so this pulls that subtree out into a
standalone params .ckpt usable for inference / resume / interpolation.

Also accepts a torch .pth that contains an `n_averaged` key (reference
SWA format) and converts it through the .pth interop layer.

Usage:
  python scripts/swa2normal.py latest.state swa_G.ckpt
  python scripts/swa2normal.py swa_model.pth swa_G.ckpt   # torch SWA
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _from_torch(path: str):
    import torch

    from trainner_tpu.utils.torch_interop import esrgan_to_params

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if "n_averaged" in sd:
        print(f"stripping SWA wrapper (n_averaged="
              f"{int(sd['n_averaged'])})")
        sd = {k[len("module."):] if k.startswith("module.") else k: v
              for k, v in sd.items() if k != "n_averaged"}
    return esrgan_to_params(sd)


def _from_state(path: str):
    from flax import serialization

    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    tree = raw.get("state", raw)
    swa = tree.get("swa_params")
    if swa is None:
        raise SystemExit(f"{path} has no swa_params subtree — was SWA "
                         "enabled (train.swa)?")
    n = tree.get("swa_n")
    if n is not None:
        print(f"swa_n = {n}")
    return swa


def main():
    p = argparse.ArgumentParser()
    p.add_argument("state", help=".state/.ckpt training state or torch "
                   ".pth with n_averaged")
    p.add_argument("out")
    args = p.parse_args()

    from trainner_tpu.utils.checkpoint import save_params

    if args.state.endswith(".pth"):
        params = _from_torch(args.state)
    else:
        params = _from_state(args.state)
    save_params(params, args.out, backup=False)
    print(f"SWA params -> {args.out}")


if __name__ == "__main__":
    main()
