"""GAN-phase stability check on real TPU: full adversarial SR training
(G pixel+GAN, D vanilla relativistic) on crops of the reference sample
image. Verifies the adversarial game stays balanced — D logits don't
collapse, losses stay finite, and PSNR stays in a sane band (GAN
finetuning trades PSNR for texture, so no bicubic bound is asserted).

Follows the reference recipe: a pixel-only pretrain phase anchors G
before the adversarial phase starts (training GAN from a random G with a
weak pixel term collapses by design, not by bug).

Usage: python scripts/sanity_gan.py [gan_iters]
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

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
img = read_img("/root/reference/data_samples/samples/OST_013.png")
scale, cs = 4, 96
rng = np.random.default_rng(0)


def make_batch(n):
    hrs = []
    for _ in range(n):
        y = rng.integers(0, img.shape[0] - cs)
        x = rng.integers(0, img.shape[1] - cs)
        hrs.append(img[y:y + cs, x:x + cs])
    hr = np.stack(hrs).astype(np.float32)
    lr = np.stack([imresize_np(h, 1 / scale) for h in hr])
    return {"LR": lr, "HR": hr}


net_g = {"type": "sr_resnet", "nf": 32, "nb": 6, "upscale": scale}
pre_opt = {"is_train": True, "scale": scale, "network_G": dict(net_g),
           "train": {"lr_G": 2e-4, "pixel_criterion": "l1",
                     "pixel_weight": 1.0, "lr_scheme": "MultiStepLR",
                     "lr_steps": [100000], "niter": 100000}}
opt = {"is_train": True, "scale": scale, "network_G": dict(net_g),
       "network_D": {"type": "discriminator_vgg", "size": cs,
                     "base_nf": 32},
       "train": {"lr_G": 1e-4, "lr_D": 1e-4,
                 "pixel_criterion": "l1", "pixel_weight": 1.0,
                 "gan_type": "vanilla", "gan_weight": 5e-3,
                 "lr_scheme": "MultiStepLR", "lr_steps": [100000],
                 "niter": 100000}}

# stage 1: PSNR pretrain (ref two-stage ESRGAN recipe)
pre = SRTrainer(pre_opt, dtype=jnp.bfloat16)
pstate = pre.init_state(jax.random.PRNGKey(0),
                        (16, cs // scale, cs // scale, 3))
for it in range(1000):
    pstate, _ = pre.train_step(pstate, make_batch(16))
print("pretrain done")

tr = SRTrainer(opt, dtype=jnp.bfloat16)
state = tr.init_state(jax.random.PRNGKey(0),
                      (16, cs // scale, cs // scale, 3))
state = state.replace(g=state.g.replace(params=pstate.g.params,
                                        extra=pstate.g.extra))

hr_val = img[:192, :192].astype(np.float32)
lr_val = imresize_np(hr_val, 1 / scale)
bic = imresize_np(lr_val, float(scale))
print("bicubic PSNR: %.2f" % calculate_psnr(bic * 255, hr_val * 255))

ok = True
for it in range(iters):
    state, logs = tr.train_step(state, make_batch(16))
    if (it + 1) % 200 == 0:
        vals = {k: float(v) for k, v in logs.items()}
        sr = np.asarray(tr.eval_step(state, jnp.asarray(lr_val[None])))[0]
        p = calculate_psnr(np.clip(sr, 0, 1) * 255, hr_val * 255)
        print("iter %d  l_g=%.4f l_d=%.4f D_real=%.2f D_fake=%.2f "
              "PSNR=%.2f" % (it + 1, vals.get("l_g_total", 0),
                             vals.get("l_d_total", 0),
                             vals.get("D_real", 0), vals.get("D_fake", 0),
                             p))
        finite = all(np.isfinite(v) for v in vals.values())
        # vanilla D collapse = |logit| exploding; 30 is far past saturation
        balanced = abs(vals.get("D_real", 0)) < 30 and \
            abs(vals.get("D_fake", 0)) < 30
        ok = ok and finite and balanced and p > 15.0
print("PASS" if ok else "FAIL")
