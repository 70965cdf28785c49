"""Device mesh + data-parallel sharding.

The reference has no multi-device story at all — its scaling unit is one GPU
per tmux pane (reference: run_sb3s.py:39-57, SURVEY.md §2.2).  Here data
parallelism is first-class: a 1-D ``data`` mesh, batches sharded over it,
parameters replicated, and gradient all-reduces inserted by XLA (riding ICI on
real multi-chip hardware).  The same jitted step runs single- or multi-chip.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"Requested {n_devices} devices but only {len(devices)} available")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_ocr(ocr, mesh: Mesh, axis_name: str = "data") -> None:
    """Re-jit an OCR wrapper's step functions for data parallelism over `mesh`.

    Parameters/optimizer state are replicated; batches are sharded on their
    leading axis.  XLA inserts psum for the gradient all-reduce.
    """
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh, axis_name)

    ocr.params = jax.device_put(ocr.params, repl)
    if ocr.opt_state is not None:
        ocr.opt_state = jax.device_put(ocr.opt_state, repl)

    # the step-function BODIES are defined once in models/base.py
    # (OCR._step_fn_defs); here they are only re-jitted with shardings
    (train_step, eval_step, forward, sample_arrays,
     train_step_many) = ocr._step_fn_defs()

    ocr._train_step = jax.jit(
        train_step,
        in_shardings=(repl, repl, data, data, None, None),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )
    # superbatch rows arrive (k*B) batch-sharded; the in-jit (k, B) reshape is
    # resharded by GSPMD so each scan step still runs data-parallel over B
    ocr._train_step_many = jax.jit(
        train_step_many,
        in_shardings=(repl, repl, data, data, None, None),
        out_shardings=(repl, repl, repl),
        static_argnums=(6,),
        donate_argnums=(0, 1),
    )
    ocr._eval_step = jax.jit(
        eval_step, in_shardings=(repl, data, data, None, None),
        out_shardings=repl)
    ocr._forward = jax.jit(forward, in_shardings=(repl, data, None),
                           out_shardings=data)
    if sample_arrays is not None:
        ocr._sample_arrays = jax.jit(
            sample_arrays, in_shardings=(repl, data, None))
    ocr._mesh = mesh
    ocr._batch_sharding = data


def enable_compilation_cache(path: str = ".jax_cache") -> None:
    """Persistent XLA compilation cache — first-compile cost is paid once per
    machine, not once per process (SLATE's train step takes ~7 min to compile
    over the remote-compile transport)."""
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
