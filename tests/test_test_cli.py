"""End-to-end inference-CLI smokes (ref codes/test.py test_loop:102 and
test_vsr.py): run test.py over synthetic datasets, check PNG outputs and
that metrics were computed."""

import os
import shutil

import yaml

import test as test_cli

ROOT = "/tmp/trainner_tpu_testcli_tests"


def _run(opt_dict, name):
    os.makedirs(ROOT, exist_ok=True)
    opt_dict = dict(opt_dict)
    opt_dict["name"] = f"debug_{name}"
    opt_dict.setdefault("path", {})["root"] = ROOT
    shutil.rmtree(os.path.join(ROOT, "results", f"debug_{name}"),
                  ignore_errors=True)
    p = os.path.join(ROOT, f"{name}.yml")
    with open(p, "w") as f:
        yaml.safe_dump(opt_dict, f)
    test_cli.main(["-opt", p])
    res = os.path.join(ROOT, "results", f"debug_{name}")
    assert os.path.isdir(res)
    pngs = [f for d, _, fs in os.walk(res) for f in fs
            if f.endswith(".png")]
    assert pngs, f"no images written under {res}"
    return res


def test_test_cli_sr_with_metrics():
    _run({"model": "sr", "scale": 2,
          "datasets": {"test_1": {"name": "synth", "mode": "synthetic",
                                  "scale": 2, "crop_size": 16,
                                  "n_samples": 2, "batch_size": 1,
                                  "n_workers": 0}},
          "network_G": {"type": "sr_resnet", "nf": 8, "nb": 2,
                        "upscale": 2},
          "metrics": "psnr,ssim"}, "sr_infer")


def test_test_cli_vsr_video_gt():
    """5-D video GT must be scored against the center frame."""
    _run({"model": "vsr", "scale": 2,
          "datasets": {"test_1": {"name": "synthv", "mode": "synthetic",
                                  "kind": "video", "scale": 2,
                                  "crop_size": 16, "num_frames": 3,
                                  "n_samples": 2, "batch_size": 1,
                                  "n_workers": 0}},
          "network_G": {"type": "sr3d_net", "nf": 4, "n_frames": 3,
                        "scale": 2},
          "metrics": "psnr"}, "vsr_infer")


def test_test_cli_x8_and_chop():
    """x8 self-ensemble and chop/tile inference through the CLI
    (ref sr_model.py test_x8:279, test_chop:319)."""
    base = {"model": "sr", "scale": 2,
            "datasets": {"test_1": {"name": "synth", "mode": "synthetic",
                                    "scale": 2, "crop_size": 16,
                                    "n_samples": 1, "batch_size": 1,
                                    "n_workers": 0}},
            "network_G": {"type": "sr_resnet", "nf": 8, "nb": 2,
                          "upscale": 2},
            "metrics": "psnr"}
    _run(dict(base, self_ensemble=True), "sr_x8")
    _run(dict(base, chop_forward=True), "sr_chop")


def test_test_cli_cem_postprocessing():
    """CEM inference with out_orig + guided-filter blend + keepY
    post-processing (ref test.py get_CEM:89 + :150-170)."""
    _run({"model": "sr", "scale": 2, "use_cem": True,
          "cem_config": {"out_orig": True, "out_filter": True,
                         "out_filter_ks": 7, "out_keepY": True},
          "datasets": {"test_1": {"name": "synth", "mode": "synthetic",
                                  "scale": 2, "crop_size": 16,
                                  "n_samples": 1, "batch_size": 1,
                                  "n_workers": 0}},
          "network_G": {"type": "sr_resnet", "nf": 8, "nb": 2,
                        "upscale": 2},
          "metrics": "psnr"}, "sr_cem")


def test_test_cli_srflow_heats_nsample():
    """SRFlow inference: heats x n_sample PNG draws per image
    (ref test_srflow.py), through the interop net (flow.interop)."""
    res = _run({"model": "srflow", "scale": 4,
                "datasets": {"test_1": {"name": "synth",
                                        "mode": "synthetic", "scale": 4,
                                        "crop_size": 32, "n_samples": 1,
                                        "batch_size": 1, "n_workers": 0}},
                "network_G": {"type": "srflow_net", "nf": 8, "nb": 2,
                              "gc": 4, "K": 1,
                              "flow": {"interop": True, "L": 2,
                                       "additionalFlowNoAffine": 1,
                                       "hidden_channels": 8,
                                       "stackRRDB": {"blocks": [0],
                                                     "concat": True}}},
                "val": {"heats": [0.0, 0.8], "n_sample": 2},
                "metrics": "psnr"}, "srflow_infer")
    import os as _os

    pngs = [f for d, _, fs in _os.walk(res) for f in fs
            if f.endswith(".png")]
    # 2 heats x 2 samples (+ the metric SR image saved by the main loop)
    assert sum("_h0.00_" in p or "_h0.80_" in p for p in pngs) == 4, pngs
