"""JAX half of the from-scratch quality A/B: trains THIS framework's
SRResNet x4 through the production SRTrainer path (trainner_tpu/train/
sr_trainer.py) under the shared protocol in quality_ab_common.py —
identical crop sequence, L1 + Adam(2e-4) + MultiStep[2000,2750], LR
generated with our MATLAB-parity imresize (proved <1e-5 against the
reference resizer in tests/test_reference_parity.py).

Runs in production bf16 by default (--f32 for the float control run).
--seed N varies the INIT seed only (the crop stream stays seed=0 so all
runs see the byte-identical data sequence) — used to measure the
init-seed spread of final PSNR, the error bar any cross-framework
comparison has to clear.

--init-from PATH loads a flax param tree serialized by
scripts/qa_matched_init.py (the torch side's exact step-0 weights via
torch_interop) in place of the jax init — the matched-init experiment
that isolates per-step training math from init-seed luck.

--noclip-lr generates train LR without the [0,1] clip (ops.imresize
clips by default; the torch side's reference resizer does not, so its
net trains on cubic-overshoot values ours clipped away — the one
remaining per-step input difference under matched init).

--highest sets jax_default_matmul_precision=highest: on TPU, "f32"
convs otherwise run Precision.DEFAULT (bf16 MXU passes) — the torch CPU
side computes true-f32 convs, so this is the remaining per-step math
difference under matched init + matched inputs.

Usage: python scripts/quality_ab_jax.py [out.jsonl] [--f32] [--seed N]
           [--init-from params.msgpack] [--noclip-lr] [--highest]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import quality_ab_common as C  # noqa: E402


def main(out_path: str = "/tmp/qa_jax.jsonl", f32: bool = False,
         seed: int = 0, init_from: str = "", clip_lr: bool = True,
         highest: bool = False) -> None:
    import jax

    if highest:
        jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from trainner_tpu.ops.imresize import imresize
    from trainner_tpu.train.sr_trainer import SRTrainer
    from trainner_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    dtype = jnp.float32 if f32 else jnp.bfloat16
    opt = {
        "is_train": True, "scale": C.SCALE,
        "network_G": {"type": "sr_resnet", "nf": 64, "nb": 16,
                      "upscale": C.SCALE, "norm_type": None,
                      "act_type": "relu", "mode": "CNA",
                      "upsample_mode": "pixelshuffle"},
        "train": {
            "lr_G": C.BASE_LR,
            "pixel_criterion": "l1", "pixel_weight": 1.0,
            "lr_scheme": "MultiStepLR",
            "lr_steps": sorted(C.LR_SCHED), "lr_gamma": 0.5,
            "niter": C.NITER,
        },
    }
    trainer = SRTrainer(opt, dtype=dtype)
    state = trainer.init_state(jax.random.PRNGKey(seed),
                               (C.BATCH, C.CROP // C.SCALE,
                                C.CROP // C.SCALE, 3))
    if init_from:
        from flax import serialization
        with open(init_from, "rb") as f:
            params = serialization.from_bytes(state.g.params, f.read())
        state = state.replace(g=state.g.replace(
            params=params, opt_state=trainer.optG.init(params)))

    imgs = C.load_train_images()
    val = C.load_val_pairs()
    stream = C.crop_stream(imgs, seed=0)

    # checkpoint/resume (round-3: a TPU-tunnel outage killed the 10k run
    # mid-flight; the torch side already resumes — mirror it)
    from flax import serialization

    ckpt_path = out_path + ".ckpt"
    start_step = 0
    if os.path.exists(ckpt_path):
        with open(ckpt_path, "rb") as f:
            blob = f.read()
        start_step = int.from_bytes(blob[:8], "little")
        state = serialization.from_bytes(state, blob[8:])
        # exact RNG repositioning without materializing crops
        stream = C.crop_stream(imgs, seed=0, skip=start_step)
        # drop rows logged after the checkpoint (duplicate-step guard)
        C.truncate_curve(out_path, start_step)

    log = C.CurveLog(out_path, {
        "side": f"trainner-tpu-{'f32' if f32 else 'bf16'}",
        "batch": C.BATCH, "crop": C.CROP, "niter": C.NITER,
        "base_lr": C.BASE_LR, "sched": C.LR_SCHED,
        "init_seed": seed, "resumed_from": start_step,
        "init_from": init_from or None, "clip_lr": clip_lr,
        "matmul_precision": "highest" if highest else "default",
        "platform": jax.devices()[0].platform},
        append=start_step > 0)

    val_lr = jnp.asarray(np.stack(
        [p[0].astype(np.float32) / 255.0 for p in val]))

    def validate(st) -> float:
        sr = np.asarray(trainer.eval_step(st, val_lr), np.float32)
        return float(np.mean([
            C.psnr_rgb(C.to_uint8(sr[i]), val[i][1])
            for i in range(len(val))]))

    for step in range(start_step + 1, C.NITER + 1):
        hr_u8 = next(stream)
        hr = hr_u8.astype(np.float32) / 255.0
        lr = np.stack([imresize(h, 1.0 / C.SCALE, kernel="cubic",
                                clip=clip_lr)
                       for h in hr]).astype(np.float32)
        state, logs = trainer.train_step(
            state, {"LR": jnp.asarray(lr), "HR": jnp.asarray(hr)})
        if step % 50 == 0:
            log.log(step, loss=round(float(logs["l_g_total"]), 5))
        if step % C.VAL_FREQ == 0 or step == C.NITER:
            log.log(step, val_psnr=round(validate(state), 4))
            host = jax.tree.map(np.asarray, state)
            with open(ckpt_path + ".tmp", "wb") as f:
                f.write(step.to_bytes(8, "little"))
                f.write(serialization.to_bytes(host))
            os.replace(ckpt_path + ".tmp", ckpt_path)


if __name__ == "__main__":
    argv = sys.argv[1:]
    seed = 0
    init_from = ""
    if "--seed" in argv:
        i = argv.index("--seed")
        seed = int(argv[i + 1])
        del argv[i:i + 2]
    if "--init-from" in argv:
        i = argv.index("--init-from")
        init_from = argv[i + 1]
        del argv[i:i + 2]
    args = [a for a in argv if not a.startswith("--")]
    main(args[0] if args else "/tmp/qa_jax.jsonl",
         f32="--f32" in argv, seed=seed, init_from=init_from,
         clip_lr="--noclip-lr" not in argv,
         highest="--highest" in argv)
