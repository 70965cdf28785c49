"""HDF5 dataset pipeline feeding HBM-resident NHWC batches.

Replaces the reference's torch Dataset/DataLoader over an open h5py group
(reference: utils/datasets.py:8-27, utils/tools.py:155-178).  Differences by
design:

* NHWC layout and /255 normalisation happen in vectorised numpy on whole
  batches, not per-item in Python.
* Shuffling uses a chunk-shuffle scheme: contiguous chunks are read from disk
  (fast for HDF5), then rows are permuted in RAM — approximate global shuffle
  at sequential-read speed.
* ``prefetch_to_device`` (data/prefetch.py) overlaps host reads with device
  compute via a background thread.
"""

from __future__ import annotations

import threading
from pathlib import Path
from typing import Iterator, Optional

import h5py
import numpy as np


class H5Dataset:
    """A split ("TrainingSet"/"ValidationSet") of an OCRL HDF5 file."""

    def __init__(self, path: str | Path, split: str):
        self._path = str(path)
        self._split = split
        self._file: Optional[h5py.File] = None
        self._lock = threading.Lock()
        self._mmaps: Optional[dict[str, np.memmap]] = None
        with h5py.File(self._path, "r") as f:
            grp = f[split]
            self.keys = [k for k in grp.keys() if k != "num_objs"]
            self.num_samples = grp["obss"].shape[0]
            self.obs_shape = grp["obss"].shape[1:]
            # contiguous uncompressed datasets (the collectors write these)
            # are served straight from a memmap: no h5py call, no chunk-cache
            # copy — reads come out of the page cache at memcpy speed, which
            # matters on this 1-core host where the loader competes with the
            # dispatch thread
            spec = {}
            for k in self.keys:
                d = grp[k]
                off = d.id.get_offset()
                if d.chunks is None and d.compression is None and off is not None:
                    spec[k] = (off, tuple(d.shape), d.dtype)
                else:
                    spec = None
                    break
            self._mmap_spec = spec

    def _mm(self) -> Optional[dict[str, np.memmap]]:
        if self._mmaps is None and self._mmap_spec:
            self._mmaps = {
                k: np.memmap(self._path, dtype=dt, mode="r", offset=off,
                             shape=shape)
                for k, (off, shape, dt) in self._mmap_spec.items()}
        return self._mmaps

    @property
    def group(self) -> h5py.Group:
        if self._file is None:
            self._file = h5py.File(self._path, "r")
        return self._file[self._split]

    def __len__(self) -> int:
        return self.num_samples

    def read_slice(self, start: int, stop: int) -> dict[str, np.ndarray]:
        mm = self._mm()
        if mm is not None:
            # memmap slices are VIEWS — downstream shuffling gathers from
            # them directly, so the bytes are copied exactly once
            return _postprocess({k: m[start:stop] for k, m in mm.items()})
        with self._lock:
            grp = self.group
            out = {}
            for key in self.keys:
                out[key] = grp[key][start:stop]
        return _postprocess(out)


def _postprocess(raw: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """labels -> int32; images stay uint8.

    The reference converts to float CHW/255 per item on the host
    (utils/datasets.py:13-24).  Here images cross the host->device boundary
    as uint8 (4x less transfer) and the /255 float conversion happens
    on-device in the jitted step (models/base.py::_as_f32).
    """
    out = {}
    for key, value in raw.items():
        if key == "obss":
            out[key] = np.asarray(value)  # uint8 passthrough
        elif key == "labels":
            out[key] = np.asarray(value, dtype=np.int32).reshape(len(value), -1)
        else:
            out[key] = np.asarray(value, dtype=np.float32)
    return out


class DataLoader:
    """Chunk-shuffled batch iterator over an H5Dataset.

    drop_last is True for shuffled (training) loaders so jitted train steps
    see a single static batch shape; validation iterates every full batch and
    one final partial batch (at most one extra compile).
    """

    def __init__(self, dataset: H5Dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, chunk_size: int = 4096, drop_last: Optional[bool] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.chunk_size = max(chunk_size, batch_size)
        self.drop_last = shuffle if drop_last is None else drop_last
        self._epoch = 0
        self._seed = seed

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        n = len(self.dataset)
        if not self.shuffle:
            for start in range(0, n, self.batch_size):
                stop = min(start + self.batch_size, n)
                if self.drop_last and stop - start < self.batch_size:
                    return
                yield self.dataset.read_slice(start, stop)
            return

        rng = np.random.default_rng(self._seed + self._epoch)
        self._epoch += 1
        chunk_starts = np.arange(0, n, self.chunk_size)
        rng.shuffle(chunk_starts)
        leftover: Optional[dict[str, np.ndarray]] = None
        for start in chunk_starts:
            stop = min(start + self.chunk_size, n)
            chunk = self.dataset.read_slice(start, stop)
            perm = rng.permutation(stop - start)
            chunk = {k: v[perm] for k, v in chunk.items()}
            if leftover is not None:
                chunk = {k: np.concatenate([leftover[k], chunk[k]]) for k in chunk}
                leftover = None
            size = len(next(iter(chunk.values())))
            full = size - size % self.batch_size
            for i in range(0, full, self.batch_size):
                yield {k: v[i:i + self.batch_size] for k, v in chunk.items()}
            if full < size:
                leftover = {k: v[full:] for k, v in chunk.items()}
        if leftover is not None and not self.drop_last:
            yield leftover


def resolve_datafile(dataset_config, repo_root: Optional[Path] = None) -> Path:
    """Find the dataset HDF5 file locally (reference: utils/tools.py:155-171).

    wandb-artifact download is replaced by a clear error: datasets are produced
    locally with scripts/collect_dataset_from_synthetic_envs.py.
    """
    repo_root = repo_root or Path.cwd()
    candidates = []
    if dataset_config.get("datadir"):
        candidates.append(Path(dataset_config.datadir))
        candidates.append(repo_root / dataset_config.datadir)
    ckpt = dataset_config.get("dataset_checkpoint")
    if ckpt and ckpt.get("file"):
        candidates.append(repo_root / dataset_config.get("dataset_dir", "datasets") / ckpt.file)
    for cand in candidates:
        if cand.is_file():
            return cand
    raise FileNotFoundError(
        f"Dataset file not found (tried {[str(c) for c in candidates]}). "
        "Generate it with: python collect_dataset_from_synthetic_envs.py env=<env>"
    )


def get_dataloaders(dataset_config, batch_size: int, num_workers: int = 0,
                    seed: int = 0) -> tuple[DataLoader, DataLoader]:
    """(train, val) loaders, reference get_dataloaders surface (tools.py:155-178)."""
    datafile = resolve_datafile(dataset_config)
    train = DataLoader(H5Dataset(datafile, "TrainingSet"), batch_size, shuffle=True, seed=seed)
    val = DataLoader(H5Dataset(datafile, "ValidationSet"), batch_size, shuffle=False)
    return train, val
