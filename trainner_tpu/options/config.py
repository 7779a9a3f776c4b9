"""Options/config system.

Parses the same YAML/JSON options-file surface as the reference framework
(ref: codes/options/options.py) into a plain nested dict with NoneDict
semantics (missing key -> None), applies per-architecture network defaults
(ref: codes/options/defaults.py) and degradation preset overlays
(ref: codes/options/presets/*.yaml, overlay precedence: inline > strategy
preset > base preset).

TPU-first differences: no CUDA_VISIBLE_DEVICES handling (device selection is
a jax mesh concern, see trainner_tpu.parallel), and AMP flags map to a bf16
mixed-precision policy instead of GradScaler state.
"""

from __future__ import annotations

import json
import os
import re

import yaml

__all__ = [
    "NoneDict",
    "dict_to_nonedict",
    "opt_get",
    "parse",
    "read_yaml",
    "read_json",
    "dict2str",
    "check_resume",
]


class NoneDict(dict):
    """dict that returns None for missing keys (ref: options/options.py:52)."""

    def __missing__(self, key):
        return None


def dict_to_nonedict(opt):
    if isinstance(opt, dict):
        return NoneDict((k, dict_to_nonedict(v)) for k, v in opt.items())
    if isinstance(opt, list):
        return [dict_to_nonedict(x) for x in opt]
    return opt


def opt_get(opt, keys, default=None):
    """Nested getter (ref: options/options.py:647)."""
    if opt is None:
        return default
    ret = opt
    for k in keys:
        ret = ret.get(k, None) if isinstance(ret, dict) else None
        if ret is None:
            return default
    return ret


# YAML 1.1 parses "5e3" as a string; add an implicit resolver so scientific
# notation without a dot/sign parses as float (standard public workaround,
# same behavior as ref options/options.py:83-99).
_SCI_RE = re.compile(
    r"""^(?:[-+]?(?:[0-9][0-9_]*)\.[0-9_]*(?:[eE][-+]?[0-9]+)?
    |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
    |\.[0-9_]+(?:[eE][-+][0-9]+)?
    |[-+]?[0-9][0-9_]*(?::[0-5]?[0-9])+\.[0-9_]*
    |[-+]?\.(?:inf|Inf|INF)
    |\.(?:nan|NaN|NAN))$""",
    re.X,
)


class _OptLoader(yaml.SafeLoader):
    pass


_OptLoader.add_implicit_resolver(
    "tag:yaml.org,2002:float", _SCI_RE, list("-+0123456789.")
)


def read_yaml(path: str) -> dict:
    with open(path, "r") as f:
        return yaml.load(f.read(), Loader=_OptLoader)


def read_json(path: str) -> dict:
    """JSON options with //-comment support (ref: options/options.py:72)."""
    with open(path, "r") as f:
        lines = f.readlines()
    txt = "".join(ln.split("//")[0] + ("\n" if "//" in ln else "") for ln in lines)
    return json.loads(txt)


def load_file(path: str) -> dict:
    ext = os.path.splitext(path)[1].lower()
    if ext in (".yml", ".yaml"):
        return read_yaml(path)
    if ext == ".json":
        return read_json(path)
    raise ValueError(f"Unknown options file extension: {path}")


# ---------------------------------------------------------------------------
# Same integer codes as the reference (ref options/options.py:17-36
# _cv2_str2interpolation): 0-6 = cv2 methods, 77x = MATLAB-style
# antialiased kernels (our ops/imresize), 997/998/999 = special dispatch.
# Note 'linear'/'cubic' map to the ANTIALIASED MATLAB kernels (773/777),
# not raw cv2 — matching the reference's preset semantics.
INTERP_CODES = {
    "cv2_nearest": 0,
    "nearest": 0,
    "cv2_linear": 1,
    "cv2_cubic": 2,
    "cv2_area": 3,
    "area": 3,
    "cv2_lanczos4": 4,
    "cv2_linear_exact": 5,
    "linear": 773,
    "bilinear": 773,
    "box": 774,
    "lanczos2": 775,
    "lanczos3": 776,
    "cubic": 777,
    "bicubic": 777,
    "matlab_bicubic": 777,
    "mitchell": 778,
    "hermite": 779,
    "lanczos4": 780,
    "lanczos5": 781,
    "bell": 782,
    "catrom": 783,
    "hanning": 784,
    "hamming": 785,
    "gaussian": 786,
    "sinc2": 787,
    "sinc3": 788,
    "sinc4": 789,
    "sinc5": 790,
    "blackman2": 791,
    "blackman3": 792,
    "blackman4": 793,
    "blackman5": 794,
    "nearest_aligned": 997,
    "down_up": 998,
    "realistic": 999,
    # legacy aliases from round 1 option files
    "matlab_nearest": 774,
    "matlab_box": 774,
    "matlab_linear": 773,
    "matlab_bilinear": 773,
    "matlab_lanczos2": 775,
    "matlab_lanczos3": 776,
}


def _algo2int(value):
    if isinstance(value, str):
        return INTERP_CODES.get(value.lower(), value)
    if isinstance(value, (list, tuple)):
        return [_algo2int(v) for v in value]
    return value


# ---------------------------------------------------------------------------
# dataset parsing
# ---------------------------------------------------------------------------

_DATAROOT_ALIASES = {
    # canonical: accepted aliases (ref: data/base_dataset.py:110)
    "dataroot_HR": ("dataroot_HR", "dataroot_B", "dataroot_gt", "dataroot_target"),
    "dataroot_LR": ("dataroot_LR", "dataroot_A", "dataroot_lq", "dataroot_input"),
}


def _normalize_dataroots(ds: dict) -> None:
    for canon, aliases in _DATAROOT_ALIASES.items():
        for a in aliases:
            if a in ds and ds.get(a) is not None:
                ds[canon] = ds[a]
                break


def _expand_paths(val):
    if isinstance(val, str):
        return os.path.expanduser(val)
    if isinstance(val, list):
        return [_expand_paths(v) for v in val]
    return val


def parse_datasets(opt: dict, opt_path: str = "") -> None:
    from . import presets as _presets  # local import to avoid cycles

    scale = opt.get("scale", 1)
    for phase_key, dataset in (opt.get("datasets") or {}).items():
        phase = phase_key.split("_")[0]
        dataset["phase"] = phase
        dataset["scale"] = scale
        _normalize_dataroots(dataset)
        if phase == "train":
            # preset overlay must land before resize-algo code mapping
            _presets.apply_presets(dataset, opt_path=opt_path)
        # crop size aliases (ref: options/options.py parse_datasets)
        if dataset.get("HR_size") is not None and dataset.get("crop_size") is None:
            dataset["crop_size"] = dataset["HR_size"]
        for k in ("dataroot_HR", "dataroot_LR"):
            if dataset.get(k) is not None:
                dataset[k] = _expand_paths(dataset[k])
                # LMDB detect
                roots = dataset[k] if isinstance(dataset[k], list) else [dataset[k]]
                if any(str(r).endswith(".lmdb") for r in roots):
                    dataset["data_type"] = "lmdb"
        dataset.setdefault("data_type", "img")
        if phase == "train":
            bs = dataset.get("batch_size") or 1
            vbs = dataset.get("virtual_batch_size") or bs
            # virtual batch must be a multiple of real batch
            dataset["virtual_batch_size"] = max(vbs, bs)
        # resize algo codes
        for k in ("lr_downscale_types", "lr_downscale_types2",
                  "hr_downscale_types", "final_scale_types", "down_up_types",
                  "resize_algos"):
            if dataset.get(k) is not None:
                dataset[k] = _algo2int(dataset[k])


# ---------------------------------------------------------------------------
# relative schedules: '*_rel' keys scaled by niter (ref: options/options.py:611)
# ---------------------------------------------------------------------------

def _resolve_rel(train_opt: dict) -> None:
    niter = train_opt.get("niter")
    if not niter:
        return
    niter = int(niter)
    for key in list(train_opt.keys()):
        if key.endswith("_rel"):
            base = key[: -len("_rel")]
            val = train_opt[key]
            if isinstance(val, (list, tuple)):
                train_opt[base] = [int(round(v * niter)) for v in val]
            elif isinstance(val, (int, float)):
                train_opt[base] = int(round(val * niter))
            del train_opt[key]


# ---------------------------------------------------------------------------
# main parse
# ---------------------------------------------------------------------------

def parse(opt_path: str, is_train: bool = True) -> NoneDict:
    """Parse an options file into a NoneDict config tree.

    Mirrors ref codes/options/options.py:539 (parse) including: dataset
    parsing, experiment dir layout, debug-name magic, relative schedules,
    per-arch network defaults and degradation preset overlay.
    """
    opt = load_file(opt_path)
    return parse_dict(opt, opt_path=opt_path, is_train=is_train)


def parse_dict(opt: dict, opt_path: str = "", is_train: bool = True) -> NoneDict:
    opt["is_train"] = is_train
    opt.setdefault("model", "sr")
    opt.setdefault("scale", 1)

    name = opt.get("name", "unnamed")
    # debug magic (ref: options/options.py:587-597)
    if name.startswith("debug"):
        opt["is_debug"] = True
        train = opt.get("train") or {}
        logger = opt.get("logger") or {}
        train["val_freq"] = 8
        logger["print_freq"] = 2
        logger["save_checkpoint_freq"] = 10**8 if "nochkp" in name else 8
        opt["train"], opt["logger"] = train, logger

    parse_datasets(opt, opt_path=opt_path)

    # network presets (gen_esrgan/disc_esrgan — ref presets dir 1:1),
    # then per-arch defaults on the merged result
    from .presets import apply_network_presets

    apply_network_presets(opt, opt_path=opt_path)

    # network defaults
    from .defaults import get_network_defaults

    get_network_defaults(opt, is_train)

    if opt.get("train"):
        _resolve_rel(opt["train"])
        # swa/atg relative iters already handled by _rel suffix

    # path bookkeeping (ref: options/options.py:566-602)
    paths = opt.get("path") or {}
    root = paths.get("root") or "."
    root = os.path.expanduser(root)
    paths = {k: _expand_paths(v) for k, v in paths.items()}
    if is_train:
        exp_root = os.path.join(root, "experiments", name)
        paths.setdefault("experiments_root", exp_root)
        paths.setdefault("models", os.path.join(exp_root, "models"))
        paths.setdefault("training_state", os.path.join(exp_root, "training_state"))
        paths.setdefault("log", exp_root)
        paths.setdefault("val_images", os.path.join(exp_root, "val_images"))
    else:
        res_root = os.path.join(root, "results", name)
        paths.setdefault("results_root", res_root)
        paths.setdefault("log", res_root)
    opt["path"] = paths

    return dict_to_nonedict(opt)


def check_resume(opt: dict, resume_iter: int) -> None:
    """Rewrite pretrain_model_* paths from a resume state (ref:
    options/options.py:670-715), incl. multi-net suffixes for cyclegan/wbc."""
    paths = opt["path"]
    if not paths.get("resume_state"):
        return
    model_dir = paths.get("models")
    model = opt.get("model", "sr")
    names: list[str]
    if model in ("cyclegan",):
        names = ["G_A", "G_B", "D_A", "D_B"]
    elif model in ("wbc",):
        names = ["G", "D_S", "D_T"]
    else:
        names = ["G", "D"]
    for n in names:
        key = f"pretrain_model_{n}"
        paths[key] = os.path.join(model_dir, f"{resume_iter}_{n}.ckpt")
    if opt_get(opt, ["train", "swa_start_iter"]) is not None:
        paths["pretrain_model_swaG"] = os.path.join(
            model_dir, f"{resume_iter}_swaG.ckpt"
        )
    if opt_get(opt, ["use_ema"]):
        paths["pretrain_model_emaG"] = os.path.join(
            model_dir, f"{resume_iter}_emaG.ckpt"
        )


def dict2str(opt: dict, indent_l: int = 1) -> str:
    """Pretty config dump (ref: options/options.py dict2str)."""
    msg = ""
    for k, v in opt.items():
        if isinstance(v, dict):
            msg += " " * (indent_l * 2) + k + ":[\n"
            msg += dict2str(v, indent_l + 1)
            msg += " " * (indent_l * 2) + "]\n"
        else:
            msg += " " * (indent_l * 2) + k + ": " + str(v) + "\n"
    return msg
