"""Degradation preset overlay system.

Mirrors ref codes/options/options.py:119-320 semantics: each train dataset
can pull three preset axes (blur / resize / noise). Overlay precedence is
inline dataset options > strategy preset > base preset.

Selection keys in the dataset options (same names as reference):
  augs_strategy: <name>            -> uses <name>_blur / <name>_resize / <name>_noise
  add_blur_preset / add_resize_preset / add_noise_preset: <name or path>
  base_blur_preset / base_resize_preset / base_noise_preset: <name or path>

Preset files are YAML with schema {kind, version, metadata, config:
{pipeline: {...flat dataset flags...}, <aug_name>: {...per-aug config...}}}.
Resolved per-aug configs land in dataset['aug_configs'][<aug_name>]; pipeline
flags merge flat into the dataset dict (inline values win).
"""

from __future__ import annotations

import os

import yaml

_AXES = ("blur", "resize", "noise")
_PRESET_DIR = os.path.dirname(os.path.abspath(__file__))


def find_preset_file(name: str, opt_path: str = "") -> str | None:
    """Resolve a preset name or path to a file (ref: options.py:168)."""
    candidates = []
    if os.path.isabs(name) or os.sep in name:
        candidates += [name, name + ".yaml", name + ".yml"]
    else:
        for ext in (".yaml", ".yml"):
            candidates.append(os.path.join(_PRESET_DIR, name + ext))
            if opt_path:
                candidates.append(
                    os.path.join(os.path.dirname(opt_path), "presets", name + ext))
    for c in candidates:
        if os.path.isfile(c):
            return c
    return None


def load_preset(name: str, opt_path: str = "") -> dict:
    path = find_preset_file(name, opt_path)
    if path is None:
        raise FileNotFoundError(f"Preset not found: {name}")
    with open(path, "r") as f:
        data = yaml.safe_load(f)
    if "pipeline" in data or "augs" in data:
        # flat schema: pipeline flags + per-aug configs under `augs`
        cfg = {"pipeline": data.get("pipeline") or {}}
        cfg.update(data.get("augs") or {})
        return cfg
    return data.get("config", {}) or {}


def apply_network_presets(opt: dict, opt_path: str = "") -> None:
    """Network preset overlay (ref ships codes/options/presets/
    gen_esrgan.yaml:1 / disc_esrgan.yaml:1 but never consumes them; we
    wire them). Selected by ``network_G_preset`` / ``network_D_preset``
    (preset name or file path) at the top level of the options file;
    preset values fill in, inline network_G/network_D keys win."""
    for net_key in ("network_G", "network_D"):
        name = opt.get(f"{net_key}_preset")
        if not name:
            continue
        cfg = load_preset(str(name), opt_path)
        preset_net = cfg.get(net_key)
        if not isinstance(preset_net, dict):
            raise ValueError(
                f"preset {name!r} has no {net_key} section")
        merged = dict(preset_net)
        inline = opt.get(net_key)
        if isinstance(inline, str):
            inline = {"type": inline}
        merged.update(inline or {})
        opt[net_key] = merged


def apply_presets(dataset: dict, opt_path: str = "") -> None:
    """Apply preset overlays to a train dataset options dict in place."""
    strategy = dataset.get("augs_strategy")
    if not (strategy or any(dataset.get(f"add_{ax}_preset") for ax in _AXES)):
        return

    inline_cfgs = {k: dict(v) for k, v in (dataset.get("aug_configs") or {}).items()
                   if isinstance(v, dict)}
    merged_cfgs: dict[str, dict] = {}
    merged_pipeline: dict = {}

    for ax in _AXES:
        base_name = dataset.get(f"base_{ax}_preset") or f"base_{ax}"
        strat_name = dataset.get(f"add_{ax}_preset") or (
            f"{strategy}_{ax}" if strategy else None)
        for name in (base_name, strat_name):  # base first, strategy overrides
            if not name:
                continue
            try:
                cfg = load_preset(name, opt_path)
            except FileNotFoundError:
                continue
            merged_pipeline.update(cfg.get("pipeline") or {})
            for aug_name, aug_cfg in cfg.items():
                if aug_name == "pipeline" or not isinstance(aug_cfg, dict):
                    continue
                merged_cfgs.setdefault(aug_name, {}).update(aug_cfg)

    # pipeline flags: inline dataset values win over presets
    for k, v in merged_pipeline.items():
        if dataset.get(k) is None:
            dataset[k] = v
    # per-aug configs: inline overrides win over presets
    for aug_name, cfg in inline_cfgs.items():
        merged_cfgs.setdefault(aug_name, {}).update(cfg)
    dataset["aug_configs"] = merged_cfgs
