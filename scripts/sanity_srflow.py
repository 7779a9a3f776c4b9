"""SRFlow learning-sanity check on real TPU: NLL must decrease when
training a small SRFlowNet on crops of the reference sample image.

Usage: python scripts/sanity_srflow.py [iters]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from trainner_tpu.utils.jax_cache import enable_compilation_cache
enable_compilation_cache()
from trainner_tpu.data.common import read_img
from trainner_tpu.ops.imresize import imresize_np
from trainner_tpu.train.srflow_trainer import SRFlowTrainer

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 600
img = read_img("/root/reference/data_samples/samples/OST_013.png")
scale, cs = 4, 64
rng = np.random.default_rng(0)


def make_batch(n):
    hrs = []
    for _ in range(n):
        y = rng.integers(0, img.shape[0] - cs)
        x = rng.integers(0, img.shape[1] - cs)
        hrs.append(img[y:y + cs, x:x + cs])
    hr = np.stack(hrs).astype(np.float32)
    lr = np.stack([imresize_np(h, 1 / scale) for h in hr])
    return {"LR": jnp.asarray(lr), "HR": jnp.asarray(hr)}


opt = {"is_train": True, "scale": scale, "model": "srflow",
       "network_G": {"type": "srflow_net", "nf": 32, "nb": 4, "gc": 16,
                     "scale": scale, "K": 4,
                     "flow": {"L": 3, "hidden_channels": 32}},
       "train": {"lr_G": 5e-4, "niter": 100000, "fl_weight": 1.0,
                 "train_RRDB_delay": 0.0, "lr_scheme": "MultiStepLR",
                 "lr_steps": [50000]}}
tr = SRFlowTrainer(opt)
state = tr.init_state(jax.random.PRNGKey(0), (8, cs // scale,
                                              cs // scale, 3))
first = None
for it in range(iters):
    state, logs = tr.train_step(state, make_batch(8))
    if (it + 1) % 100 == 0:
        nll = float(logs["nll"])
        if first is None:
            first = nll
        print(f"iter {it + 1}  nll={nll:.4f}")
last = float(logs["nll"])
print("PASS" if np.isfinite(last) and last < first else "FAIL",
      f"nll {first:.3f} -> {last:.3f}")
