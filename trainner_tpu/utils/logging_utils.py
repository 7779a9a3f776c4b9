"""Loggers and observability.

Equivalents of ref codes/utils/util.py: get_root_logger:48 (named loggers,
file + screen), mkdir_and_rename:33 (archive old experiment dirs),
sorted_nicely:69, plus the TensorBoard scalar writer used by ref
codes/train.py:54-77. The TB writer uses torch.utils.tensorboard when
available and always mirrors scalars to a JSONL file (grep-able,
no-dependency observability for headless TPU pods).
"""

from __future__ import annotations

import json
import logging
import os
import re
import shutil
import time
from datetime import datetime
from typing import Dict, Optional

_FORMAT = "%(asctime)s.%(msecs)03d - %(levelname)s: %(message)s"


def mkdir_and_rename(path: str) -> None:
    """If path exists, archive it with a timestamp suffix
    (ref util.py:33)."""
    if os.path.exists(path):
        stamp = datetime.now().strftime("%Y%m%d-%H%M%S")
        shutil.move(path, path + "_archived_" + stamp)
    os.makedirs(path, exist_ok=True)


def mkdirs(paths) -> None:
    if isinstance(paths, str):
        os.makedirs(paths, exist_ok=True)
        return
    for p in paths:
        if p and isinstance(p, str) and not os.path.splitext(p)[1]:
            os.makedirs(p, exist_ok=True)


def sorted_nicely(items):
    """Human sort (ref util.py:69): 10_G.ckpt after 9_G.ckpt."""
    convert = lambda t: int(t) if t.isdigit() else t
    return sorted(items, key=lambda k: [convert(c)
                                        for c in re.split(r"([0-9]+)", k)])


def get_root_logger(name: str = "base", root: Optional[str] = None,
                    phase: str = "train", level=logging.INFO,
                    screen: bool = True, tofile: bool = True
                    ) -> logging.Logger:
    """Named logger writing file + screen (ref util.py:48)."""
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(level)
    fmt = logging.Formatter(_FORMAT, datefmt="%y-%m-%d %H:%M:%S")
    if tofile and root:
        os.makedirs(root, exist_ok=True)
        ts = time.strftime("%y%m%d-%H%M%S")
        fh = logging.FileHandler(
            os.path.join(root, f"{phase}_{ts}.log"), mode="w")
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    if screen:
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
    logger.propagate = False
    return logger


class ScalarWriter:
    """TensorBoard-compatible scalar writer with a JSONL mirror
    (replaces ref train.py's SummaryWriter usage)."""

    def __init__(self, log_dir: str, use_tb: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        self._tb = None
        if use_tb:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception:
                self._tb = None

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        self._jsonl.write(json.dumps(
            {"tag": tag, "value": float(value), "step": int(step),
             "ts": time.time()}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def add_scalars(self, scalars: Dict[str, float], step: int,
                    prefix: str = "") -> None:
        for k, v in scalars.items():
            self.add_scalar(prefix + k, v, step)

    def flush(self) -> None:
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class ProgressBar:
    """Minimal console progress bar (ref utils/progress_bar.py)."""

    def __init__(self, total: int, width: int = 40, stream=None):
        import sys as _sys

        self.total = max(total, 1)
        self.width = width
        self.count = 0
        self.start = time.time()
        self.stream = stream or _sys.stdout

    def update(self, msg: str = "") -> None:
        self.count += 1
        frac = self.count / self.total
        filled = int(self.width * frac)
        bar = "#" * filled + "-" * (self.width - filled)
        elapsed = time.time() - self.start
        eta = elapsed / max(frac, 1e-9) * (1 - frac)
        self.stream.write(
            f"\r[{bar}] {self.count}/{self.total} "
            f"({elapsed:.0f}s, eta {eta:.0f}s) {msg}")
        if self.count >= self.total:
            self.stream.write("\n")
        self.stream.flush()
