"""Producer-side profile of the e2e training loop (VERDICT r4 #2): where
do the host milliseconds go between device steps?

Measures, per batch (32 samples, 128px HR crops, bench corpus — the
exact bench.bench_train_e2e config):
  decode       cv2.imread of the HR source tile
  getitem      dataset[i] total (decode + crop + flip/rot + wire)
  collate      np.stack of 32 samples
  loader       threaded DataLoader end-to-end (amortized, includes all of
               the above overlapped across workers)
  h2d          host->device transfer of one batch (jax.device_put + sync)
  degrade      on-device degradation dispatch+execution (isolated)

Run CPU-only for the host rows: JAX_PLATFORMS=cpu python
scripts/profile_producer.py --host-only. Full run needs the TPU free.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _t(fn, n, *args, **kw):
    fn(*args, **kw)  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        fn(*args, **kw)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main(host_only: bool = False, shuffle: bool = False) -> None:
    import bench
    from trainner_tpu.data.datasets import create_dataset
    from trainner_tpu.data.loader import create_dataloader
    from trainner_tpu.options.config import parse_dict

    root = bench._ensure_bench_corpus()
    bs = 32
    opt = {
        "is_train": True, "scale": 4, "model": "sr",
        "datasets": {"train": {
            "name": "bench", "mode": "aligned", "dataroot_HR": root,
            "crop_size": 128, "batch_size": bs, "use_flip": True,
            "use_rot": True, "augs_strategy": "bsrgan",
            "resize_strat": "in", "n_workers": 4, "wire_dtype": "uint8",
            "shuffle_degradations": shuffle}},
        "network_G": {"type": "rrdb_net", "nf": 64, "nb": 23, "gc": 32,
                      "upscale": 4},
        "train": {"lr_G": 1e-4, "pixel_criterion": "l1",
                  "pixel_weight": 1.0, "lr_scheme": "MultiStepLR",
                  "lr_steps": [50000]},
    }
    popt = parse_dict(opt, is_train=True)
    ds_opt = popt["datasets"]["train"]
    dataset = create_dataset(ds_opt)

    rows = {}

    import cv2
    paths = dataset.hr_paths
    rows["decode_ms_per_sample"] = _t(
        lambda: [cv2.imread(paths[i % len(paths)], cv2.IMREAD_COLOR)
                 for i in range(bs)], 5) / bs

    rows["getitem_ms_per_sample"] = _t(
        lambda: [dataset[i % len(dataset)] for i in range(bs)], 5) / bs

    samples = [dataset[i % len(dataset)] for i in range(bs)]
    from trainner_tpu.data.loader import _collate
    rows["collate_ms_per_batch"] = _t(
        lambda: _collate(samples), 20)

    loader = create_dataloader(dataset, ds_opt)

    def loader_epoch(n=8):
        got = 0
        while got < n:  # tiny corpus: 2 batches/epoch, chain epochs
            for b in loader:
                got += 1
                if got >= n:
                    break

    rows["loader_ms_per_batch"] = _t(loader_epoch, 3) / 8

    if not host_only:
        import jax
        import jax.numpy as jnp
        import jax.random as jr

        import train as train_mod
        from trainner_tpu.utils.jax_cache import enable_compilation_cache

        enable_compilation_cache()
        batch = {k: v for k, v in _collate(samples).items()
                 if isinstance(v, np.ndarray)}

        def h2d():
            d = {k: jax.device_put(v) for k, v in batch.items()}
            jax.block_until_ready(d["HR"])
            float(jnp.sum(d["HR"][0, 0, 0, 0]))  # true sync via host read

        rows["h2d_ms_per_batch"] = _t(h2d, 10)

        degrade = train_mod.make_otf_degradation(popt)
        if degrade is not None:
            dbatch = {k: jax.device_put(v) for k, v in batch.items()}
            rng = jr.PRNGKey(0)

            def deg():
                out = degrade(rng, dbatch)
                float(jnp.sum(out["LR"][0, 0, 0, 0]))

            rows["degrade_ms_per_batch"] = _t(deg, 10)

    rows["platform"] = "host-only" if host_only else None
    import json
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in rows.items()}))


if __name__ == "__main__":
    main(host_only="--host-only" in sys.argv,
         shuffle="--shuffle" in sys.argv)
