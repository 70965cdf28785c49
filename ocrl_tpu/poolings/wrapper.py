"""Pooling wrapper: OCR + pooling with frozen / aux-loss / fine-tune modes
(reference: poolings/base.py).

``__call__(obs, with_loss)`` matches the reference semantics:
  * learn_aux_loss: the OCR's own loss is returned as ``aux_loss`` metrics;
  * learn_downstream_loss: representations are NOT detached (fine-tuning);
  * otherwise the OCR is frozen (stop_gradient).
The whole chain is one jitted function; the repeated encoder subgraph between
the loss and rep paths is CSE'd by XLA.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..models import create_ocr
from ..models.base import OCR, normalize_obs
from ..utils.checkpoint import load_checkpoint
from .modules import create_pooling_module, pooled_dim


def resolve_ocr_checkpoint_path(cpt_config) -> Optional[Path]:
    """reference: utils/tools.py:39-52 (local files only; no wandb egress)."""
    local = cpt_config.get("local_file", "")
    if local:
        path = Path(local)
        if not path.exists():
            raise FileNotFoundError(f"OCR checkpoint not found: {path}")
        return path
    if cpt_config.get("run_id"):
        # interpret run_id as a local run directory
        path = Path(cpt_config.run_id) / "checkpoints" / "model_best.ckpt"
        if not path.exists():
            path = Path(cpt_config.run_id) / "checkpoints" / "model_latest.ckpt"
        if not path.exists():
            raise FileNotFoundError(
                f"No checkpoint under run dir '{cpt_config.run_id}' "
                "(wandb download is not available in this offline build; "
                "point ocr_checkpoint.local_file or .run_id at a local run)")
        return path
    return None


def get_ocr(ocr_config, env_config, cpt_config, seed: int = 0) -> tuple[OCR, bool]:
    """Build the OCR, loading a pretrained checkpoint when configured
    (reference: utils/tools.py:323-347).  Returns (ocr, pretrained)."""
    ocr = create_ocr(ocr_config, env_config, seed=seed)
    path = resolve_ocr_checkpoint_path(cpt_config)
    if path is None:
        return ocr, False
    if path.suffix == ".pth":  # reference-format torch checkpoint
        from ..utils.torch_convert import load_reference_checkpoint

        load_reference_checkpoint(path, ocr)
        return ocr, True
    tree, _ = load_checkpoint(path, ocr.save())
    ocr.load(tree)
    return ocr, True


class Pooling:
    """Host-side handle pairing an OCR with a pooling module."""

    def __init__(self, ocr: OCR, config, num_stacked_obss: int = 1, seed: int = 0):
        self._ocr = ocr
        self._config = config
        self.name = config.name
        self._learn_aux_loss = config.learn_aux_loss
        self._learn_downstream_loss = config.learn_downstream_loss
        self._load_ocr()

        self.module = create_pooling_module(
            config.name, ocr.rep_dim, ocr.num_slots, config, num_stacked_obss)
        self.rep_dim = pooled_dim(config.name, config, ocr.rep_dim, ocr.num_slots,
                                  num_stacked_obss)

        rng = jax.random.PRNGKey(seed + 1)
        # vector models (num_slots==1) emit [B, D]; slot models emit [B, N, D]
        if ocr.num_slots == 1:
            dummy_rep = jnp.zeros((1, ocr.rep_dim), jnp.float32)
        else:
            dummy_rep = jnp.zeros((1, ocr.num_slots, ocr.rep_dim), jnp.float32)
        variables = jax.jit(self.module.init)(rng, dummy_rep)
        self.params = variables.get("params", {})

        learning = config.get("learning")
        if learning is not None and learning.get("lr") is not None:
            self.tx = optax.adam(learning.lr)
            self.opt_state = self.tx.init(self.params)
        else:
            self.tx = None
            self.opt_state = None

        self._rng = jax.random.PRNGKey(seed + 2)
        self._build_fns()

    def _load_ocr(self) -> None:
        """reference: poolings/base.py:25-30."""
        path = resolve_ocr_checkpoint_path(self._config.ocr_checkpoint)
        if path is not None:
            tree, _ = load_checkpoint(path, self._ocr.save())
            self._ocr.load(tree)

    def _build_fns(self) -> None:
        ocr_module = self._ocr.spec.module
        pool_module = self.module
        detach = not self._learn_downstream_loss
        aux = self._learn_aux_loss

        def fwd(ocr_params, pool_params, obs, rng):
            rngs = self._ocr._rngs_for(rng)
            rep = ocr_module.apply({"params": ocr_params}, obs, rngs=rngs)
            if detach:
                rep = jax.lax.stop_gradient(rep)
            return pool_module.apply({"params": pool_params}, rep)

        def fwd_with_loss(ocr_params, pool_params, obs, rng):
            rngs = self._ocr._rngs_for(rng)
            metrics = {}
            if aux:
                loss, m = ocr_module.apply({"params": ocr_params}, obs, None,
                                           jnp.int32(0), True, rngs=rngs,
                                           method="loss")
                metrics = {("aux_loss" if k == "loss" else k): v for k, v in m.items()}
            rep = ocr_module.apply({"params": ocr_params}, obs, rngs=rngs)
            if detach:
                rep = jax.lax.stop_gradient(rep)
            pooled = pool_module.apply({"params": pool_params}, rep)
            return pooled, metrics

        self._fwd = jax.jit(fwd)
        self._fwd_with_loss = jax.jit(fwd_with_loss)

    def _next_rng(self):
        self._rng, rng = jax.random.split(self._rng)
        return rng

    def __call__(self, obs, with_loss: bool = False):
        obs = normalize_obs(obs)
        if with_loss:
            return self._fwd_with_loss(self._ocr.params, self.params, obs,
                                       self._next_rng())
        return self._fwd(self._ocr.params, self.params, obs, self._next_rng())

    def get_samples(self, obs) -> dict:
        return self._ocr.get_samples(obs)

    def save(self) -> dict:
        ckpt = {"pooling_module_state_dict": self.params}
        if self.opt_state is not None:
            ckpt["pooling_opt_state_dict"] = self.opt_state
        ckpt.update(self._ocr.save())
        return ckpt

    def load(self, checkpoint: dict) -> None:
        self.params = checkpoint["pooling_module_state_dict"]
        if self.opt_state is not None and "pooling_opt_state_dict" in checkpoint:
            self.opt_state = checkpoint["pooling_opt_state_dict"]
        self._ocr.load(checkpoint)
