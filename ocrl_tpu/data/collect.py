"""Synthetic-env dataset collection into OCRL-format HDF5 files.

The reference documents this entry point only through its config
(reference: configs/collect_dataset_from_synthetic_envs.yaml — the script
itself is absent from the snapshot; SURVEY.md §2.6 note).  Output format
matches what utils/datasets.py expects: groups TrainingSet/ValidationSet with
``obss`` (uint8 NHWC), ``num_objs``, optional ``masks`` and ``labels``.
"""

from __future__ import annotations

import multiprocessing as mp
from pathlib import Path

import h5py
import numpy as np


def canonical_filename(env_cfg, num_tr: int, num_val: int, seed: int) -> str:
    """Filename convention compatible with the reference's dataset registry
    (e.g. configs/dataset/random-N5C4S4S2.yaml datadir)."""
    n0, n1 = env_cfg.num_objects_range
    nrange = f"N{n0}" if n0 == n1 else f"N{n0}-{n1}"
    agent = "No" if env_cfg.get("agent_pos") is None else (
        "".join(f"{int(p * 10):02d}"[:2] for p in env_cfg.agent_pos))
    return (
        f"{env_cfg.env}-{nrange}C{len(env_cfg.COLORS)}S{len(env_cfg.SHAPES)}"
        f"S{len(env_cfg.SCALES)}-{env_cfg.mode}Mode-AgentPos{agent}"
        f"-WoAgent{env_cfg.wo_agent}-Occlusion{env_cfg.occlusion}"
        f"-Skewed{env_cfg.skewed}-Seed{seed}-Tr{num_tr}-Val{num_val}.hdf5"
    )


def _collect_worker(args):
    (env_name, env_cfg_dict, seed, count, only_initial, with_masks, with_labels,
     with_states) = args
    from ocrl_tpu.config.node import from_dict
    import ocrl_tpu.envs as envs

    env_cfg = from_dict(env_cfg_dict)
    env = getattr(envs, env_cfg.env)(env_cfg, seed)
    obss = np.empty((count, env_cfg.obs_size, env_cfg.obs_size, env_cfg.obs_channels),
                    dtype=np.uint8)
    num_objs = np.empty((count,), dtype=np.int64)
    masks = None
    labels = np.empty((count,), dtype=np.int64) if with_labels else None
    objs = None
    if with_states:
        objs = np.empty((count, env_cfg.num_objects_range[1], env_cfg.state_size),
                        dtype=np.float32)
    i = 0
    obs = env.reset()
    while i < count:
        if only_initial:
            obs = env.reset()
        else:
            obs, _, done, _ = env.step(env.action_space.sample())
            if done:
                obs = env.reset()
        obss[i] = obs
        num_objs[i] = env._num_objects
        if with_masks:
            m = env.render("mask")
            if masks is None:
                masks = np.empty((count,) + m.shape, dtype=np.uint8)
            masks[i] = m.astype(np.uint8)
        if with_labels:
            # classification target must be OBSERVABLE from the image: the
            # raw _target_obj_idx is an internal list position that is
            # random w.r.t. pixels for synthetic envs (the reference's CW
            # collector gets away with the index because its easy-mode
            # position table is fixed per index, target.py:176-181; its
            # synthetic classifier collector is absent from the snapshot).
            # Label = image quadrant of the target object's centre — a
            # 4-class position-binding probe (num_labels=4 preserved).
            state = env.render("state", fill_empty=True)
            tx, ty = state[env._target_obj_idx][-2:]
            labels[i] = int(ty > 0.5) * 2 + int(tx > 0.5)
        if with_states:
            # per-object GT rows (objects only, zero-padded; agent row dropped)
            state = env.render("state", fill_empty=True)
            objs[i] = state[: env_cfg.num_objects_range[1]]
        i += 1
    out = {"obss": obss, "num_objs": num_objs}
    if masks is not None:
        out["masks"] = masks
    if labels is not None:
        out["labels"] = labels
    if objs is not None:
        out["objs"] = objs
    return out


def collect_dataset(env_cfg, num_tr: int, num_val: int, num_proc: int = 1,
                    only_initial: bool = True, seed: int = 0,
                    chunk_size: int = 100000, with_masks: bool = False,
                    with_labels: bool = False, with_states: bool = False,
                    out_file: str | Path | None = None,
                    out_dir: str | Path = "datasets") -> Path:
    """Collect observations and write the HDF5 dataset; returns the file path."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if out_file is None:
        out_file = out_dir / canonical_filename(env_cfg, num_tr, num_val, seed)
    out_file = Path(out_file)
    out_file.parent.mkdir(parents=True, exist_ok=True)

    env_cfg_dict = env_cfg.to_dict()
    with h5py.File(out_file, "w") as f:
        for split, total, seed0 in (("TrainingSet", num_tr, seed),
                                    ("ValidationSet", num_val, seed + 10_000)):
            grp = f.create_group(split)
            dsets: dict[str, h5py.Dataset] = {}
            written = 0
            while written < total:
                n = min(chunk_size, total - written)
                per = [n // num_proc + (1 if r < n % num_proc else 0)
                       for r in range(num_proc)]
                jobs = [(env_cfg.env, env_cfg_dict, seed0 + written + r, c,
                         only_initial, with_masks, with_labels, with_states)
                        for r, c in enumerate(per) if c > 0]
                if num_proc > 1 and len(jobs) > 1:
                    with mp.get_context("fork").Pool(len(jobs)) as pool:
                        parts = pool.map(_collect_worker, jobs)
                else:
                    parts = [_collect_worker(j) for j in jobs]
                merged = {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}
                for key, arr in merged.items():
                    if key not in dsets:
                        dsets[key] = grp.create_dataset(
                            key, shape=(total,) + arr.shape[1:], dtype=arr.dtype)
                    dsets[key][written:written + n] = arr
                written += n
    return out_file
