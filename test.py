"""Inference + metrics driver CLI.

Equivalent of ref codes/test.py: test_loop:102 — batch inference over the
configured test datasets, PNG dumps, PSNR/SSIM (+Y-channel) per image and
dataset averages; x8 self-ensemble and chop/tile modes
(ref models/sr_model.py test_x8:279, test_chop:319).

Usage: python test.py -opt options/sr/test_sr.yml
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np


def parse_options(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", type=str, required=True)
    args = parser.parse_args(argv)
    from trainner_tpu.options import parse

    return parse(args.opt, is_train=False)


def main(argv=None):
    from trainner_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    opt = parse_options(argv)

    from trainner_tpu.data import create_dataloader, create_dataset
    from trainner_tpu.data.common import save_img, tensor2img
    from trainner_tpu.utils.logging_utils import get_root_logger, mkdirs
    from trainner_tpu.utils.metrics import MetricsDict

    mkdirs([opt["path"]["results_root"], opt["path"]["log"]])
    logger = get_root_logger("base", opt["path"]["log"], "test")

    import jax
    import jax.numpy as jnp

    from train import create_trainer
    from trainner_tpu.utils.checkpoint import load_params

    trainer = create_trainer(opt)

    test_loaders = []
    for phase_key, dataset_opt in (opt.get("datasets") or {}).items():
        ds = create_dataset(dataset_opt)
        test_loaders.append((dataset_opt.get("name") or phase_key,
                             create_dataloader(ds, dataset_opt)))

    state = None
    scale = int(opt.get("scale") or 1)
    znorm = False
    model = (opt.get("model") or "sr").lower()
    ensemble_x8 = bool(opt.get("self_ensemble") or opt.get("x8"))
    chop = opt.get("chop_forward") or opt.get("chop")
    # band-parallel big-image inference over all devices (the multi-chip
    # analogue of chop — parallel/spatial.py); `spatial_shards: N` in the
    # options enables it when >1 device is visible
    sp_shards = int(opt.get("spatial_shards") or 0)
    sp_mesh = None
    if sp_shards > 1 and len(jax.devices()) >= sp_shards:
        from trainner_tpu.parallel import make_spatial_mesh

        sp_mesh = make_spatial_mesh(sp_shards)
    sp_halo = int(opt.get("spatial_halo") or 32)
    # SRFlow sampling controls (ref test_srflow.py:23)
    heats = (opt.get("val") or {}).get("heats") or [0.0]
    n_sample = int((opt.get("val") or {}).get("n_sample", 1) or 1)

    for name, loader in test_loaders:
        logger.info(f"Testing [{name}]...")
        res_dir = os.path.join(opt["path"]["results_root"], name)
        os.makedirs(res_dir, exist_ok=True)
        lpips_w = (opt.get("path") or {}).get("lpips_weights")
        metrics = MetricsDict(opt.get("metrics") or "psnr,ssim",
                              lpips_weights=lpips_w)
        metrics_y = MetricsDict(opt.get("metrics") or "psnr,ssim",
                                lpips_weights=lpips_w)
        n_img = 0
        for i, batch in enumerate(loader):
            in_key = "in" if model == "dvd" else "LR"
            lr = jnp.asarray(batch[in_key])
            if state is None:
                state = trainer.init_state(jax.random.PRNGKey(0), lr.shape)
                g_path = opt["path"].get("pretrain_model_G")
                if g_path:
                    state = state.replace(g=state.g.replace(
                        params=load_params(g_path, state.g.params)))
                    logger.info(f"Loaded G from {g_path}")
                else:
                    logger.warning("No pretrain_model_G given — running "
                                   "random-init weights.")
            if model == "srflow":
                # heats x n_sample latent draws (ref test_srflow.py)
                for heat in heats:
                    for k in range(n_sample):
                        s = trainer.eval_step(state, lr, heat=heat)
                        img = tensor2img(np.asarray(s)[0], znorm)
                        img_name0 = os.path.splitext(os.path.basename(
                            batch.get("LR_path", [str(i)])[0]))[0]
                        save_img(img, os.path.join(
                            res_dir, f"{img_name0}_h{heat:.2f}_{k}.png"))
                sr = trainer.eval_step(state, lr, heat=heats[0])
            elif model == "dvd":
                top, bottom = trainer.eval_step_both(state, lr)
                sr = top
                save_img(tensor2img(np.asarray(bottom)[0], znorm),
                         os.path.join(res_dir, f"{i}_bottom.png"))
            elif model == "sftgan" and "seg" in batch:
                sr = trainer.eval_step(state, lr,
                                       jnp.asarray(batch["seg"]))
            elif ensemble_x8:
                sr = trainer.eval_step_x8(state, lr)
            elif sp_mesh is not None:
                sr = trainer.eval_step_spatial(state, lr, sp_mesh,
                                               halo=sp_halo)
            elif chop:
                sr = trainer.eval_step_chop(state, lr)
            else:
                sr = trainer.eval_step(state, lr)

            # CEM post-processing (ref test.py:150-170): optionally blend
            # with the unconstrained output via a guided filter and/or
            # keep the unconstrained luma with CEM chroma
            cem_cfg = opt.get("cem_config") or {}
            if opt.get("use_cem") and cem_cfg.get("out_orig") \
                    and hasattr(trainer, "eval_step"):
                sr_orig = trainer.eval_step(state, lr, apply_cem=False)
                if cem_cfg.get("out_filter"):
                    from trainner_tpu.ops.filters import guided_filter

                    ks = int(cem_cfg.get("out_filter_ks", 7))
                    filt = guided_filter(sr, sr - sr_orig,
                                         radius=(ks - 1) // 2)
                    sr = sr_orig + filt
                if cem_cfg.get("out_keepY"):
                    from trainner_tpu.ops.colors import (rgb_to_ycbcr,
                                                         ycbcr_to_rgb)

                    y_orig = rgb_to_ycbcr(sr_orig)
                    y_cem = rgb_to_ycbcr(sr)
                    sr = ycbcr_to_rgb(jnp.concatenate(
                        [y_orig[..., :1], y_cem[..., 1:]], axis=-1))
            sr_img = tensor2img(np.asarray(sr)[0], znorm)
            img_name = os.path.splitext(os.path.basename(
                batch.get("LR_path", [str(i)])[0]))[0]
            save_img(sr_img, os.path.join(res_dir, img_name + ".png"))
            n_img += 1
            if batch.get("HR") is not None:
                gt = batch["HR"]
                if getattr(gt, "ndim", 4) == 5:
                    # video GT (b,t,h,w,c): score the center frame
                    # (ref test_vsr.py supervises HR_center)
                    gt = gt[:, gt.shape[1] // 2]
                gt_img = tensor2img(gt[0], znorm)
                r = metrics.calculate_metrics(sr_img, gt_img,
                                              crop_size=scale)
                ry = metrics_y.calculate_metrics(sr_img, gt_img,
                                                 crop_size=scale,
                                                 only_y=True)
                msg = " ".join(f"{k}: {v:.6g}" for k, v in r.items())
                msgy = " ".join(f"{k}_Y: {v:.6g}" for k, v in ry.items())
                logger.info(f"{img_name:20s} | {msg} | {msgy}")
        avg = metrics.get_averages()
        avgy = metrics_y.get_averages()
        if avg:
            msg = " ".join(f"{m['name']}: {m['average']:.6g}" for m in avg)
            msgy = " ".join(f"{m['name']}_Y: {m['average']:.6g}"
                            for m in avgy)
            logger.info(f"[{name}] average ({n_img} images) | {msg} | "
                        f"{msgy}")
        else:
            logger.info(f"[{name}] saved {n_img} images (no GT metrics)")


if __name__ == "__main__":
    main()
