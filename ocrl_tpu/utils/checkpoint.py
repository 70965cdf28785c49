"""Checkpointing with the reference's latest/best/step semantics.

The reference writes ``model_{step}.pth`` / ``model_latest.pth`` /
``model_best.pth`` with nested module+optimizer state and step/epoch metadata
(reference: utils/tools.py:267-289, load :223-263).  Here the payload is a JAX
pytree serialized with flax msgpack; metadata rides in a JSON sidecar inside
the same file envelope.
"""

from __future__ import annotations

import json
import struct
from pathlib import Path
from typing import Any, Optional

import jax
from flax import serialization

_MAGIC = b"OCRLTPU1"


def save_checkpoint(path: str | Path, tree: Any, metadata: dict) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tree = jax.device_get(tree)
    meta_bytes = json.dumps(metadata).encode()
    tree_bytes = serialization.to_bytes(tree)
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<Q", len(meta_bytes)))
        f.write(meta_bytes)
        f.write(tree_bytes)


def migrate_bcdec_tree(d: Any) -> Any:
    """Rename BroadCastDecoder state saved under the pre-round-4
    ``blocks/layers_{0..3}`` layout to the ``conv1``/``rest`` layout
    (the first conv was split out of its relu so the spatially-constant
    broadcast input can be evaluated on a 5x5 grid — models/dvae.py).
    Applies recursively, so optimizer-state mirrors of the param tree are
    migrated too."""
    if not isinstance(d, dict):
        return d
    out = {}
    for k, v in d.items():
        if isinstance(v, dict) and k == "bcdec" and "blocks" in v \
                and "layers_0" in v["blocks"]:
            b = v["blocks"]
            nv = {kk: migrate_bcdec_tree(vv)
                  for kk, vv in v.items() if kk != "blocks"}
            nv["conv1"] = b["layers_0"]["Conv_0"]
            nv["rest"] = {"layers_0": b["layers_1"],
                          "layers_1": b["layers_2"],
                          "layers_2": b["layers_3"]}
            out[k] = nv
        else:
            out[k] = migrate_bcdec_tree(v)
    return out


def load_checkpoint(path: str | Path, template: Any) -> tuple[Any, dict]:
    """Restore (tree, metadata); `template` supplies pytree structure/dtypes."""
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"Not an ocrl_tpu checkpoint: {path}")
        (meta_len,) = struct.unpack("<Q", f.read(8))
        metadata = json.loads(f.read(meta_len).decode())
        payload = f.read()
        try:
            tree = serialization.from_bytes(template, payload)
        except (KeyError, ValueError):
            raw = migrate_bcdec_tree(serialization.msgpack_restore(payload))
            tree = serialization.from_state_dict(template, raw)
    return tree, metadata


def save(model, run_dir: str | Path, step: int = 0, epoch: int = 0,
         best_val_loss: float = 1e5, episode: int = 0,
         agent_training: bool = False, best: bool = False) -> None:
    """Reference-compatible save (utils/tools.py:267-289)."""
    ckpt_dir = Path(run_dir) / "checkpoints"
    if agent_training:
        metadata = {"step": step, "episode": episode}
    else:
        metadata = {"step": step, "epoch": epoch, "best_val_loss": float(best_val_loss)}
    tree = model.save()
    save_checkpoint(ckpt_dir / f"model_{step}.ckpt", tree, metadata)
    save_checkpoint(ckpt_dir / "model_latest.ckpt", tree, metadata)
    if best:
        save_checkpoint(ckpt_dir / "model_best.ckpt", tree, metadata)


def load(model, run_dir: Optional[str | Path] = None, agent_training: bool = False,
         resume_checkpoint: Optional[str] = None,
         resume_run_path: Optional[str] = None):
    """Reference-compatible load (utils/tools.py:223-263).

    Resolution order: explicit checkpoint path -> other run's latest ->
    this run dir's latest.  Returns (step, epoch, best_val_loss) or
    (step, episode) when agent_training.
    """
    path = None
    if resume_checkpoint is not None:
        path = Path(resume_checkpoint)
    elif resume_run_path is not None:
        path = Path(resume_run_path) / "checkpoints" / "model_latest.ckpt"
    elif run_dir is not None:
        candidate = Path(run_dir) / "checkpoints" / "model_latest.ckpt"
        if candidate.exists():
            path = candidate

    if path is not None and Path(path).exists():
        tree, metadata = load_checkpoint(path, model.save())
        model.load(tree)
        step = metadata["step"]
        if agent_training:
            return step, metadata.get("episode", 0)
        return step, metadata.get("epoch", 0), metadata.get("best_val_loss", 1e10)

    if agent_training:
        return 0, 0
    return 0, 0, 1e10
