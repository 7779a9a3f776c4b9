"""Dataset / degradation-pipeline visual debugging harness.

Equivalent of ref codes/test_dataloader.py (the reference's de-facto
dataops unit test): build a dataset + the on-device degradation pipeline
from an options file, iterate a few batches, print tensor stats and dump
the LR/HR images for eyeballing.

Usage:
  python scripts/test_dataloader.py -opt options/sr/train_sr_debug.yml \
      [-n 2] [-out /tmp/dl_vis]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-opt", required=True)
    p.add_argument("-n", type=int, default=2, help="batches to dump")
    p.add_argument("-out", default="/tmp/trainner_tpu_dl_vis")
    args = p.parse_args()

    from trainner_tpu.options import parse
    from trainner_tpu.data import create_dataloader, create_dataset
    from trainner_tpu.utils.debug import describe_array, tmp_vis
    from train import make_otf_degradation

    opt = parse(args.opt, is_train=True)
    train_ds_opt = None
    for key, ds in (opt.get("datasets") or {}).items():
        if key.split("_")[0] == "train":
            train_ds_opt = ds
    dataset = create_dataset(train_ds_opt)
    loader = create_dataloader(dataset, train_ds_opt)
    degrade = make_otf_degradation(opt)

    import jax
    import numpy as np

    rng = jax.random.PRNGKey(0)
    for i, batch in enumerate(loader):
        if i >= args.n:
            break
        arrays = {k: v for k, v in batch.items()
                  if isinstance(v, np.ndarray)}
        if degrade is not None:
            rng, r = jax.random.split(rng)
            arrays = degrade(r, arrays)
        for k, v in arrays.items():
            print(describe_array(v, f"batch{i}.{k}"))
            tmp_vis(v, os.path.join(args.out, f"batch{i}"), k)
    print(f"dumped {args.n} batches -> {args.out}")


if __name__ == "__main__":
    main()
