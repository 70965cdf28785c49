"""OCR model wrapper: functional train/eval steps under jit.

Replaces the reference's torch `Base` wrapper (reference: ocrs/base.py) with a
TPU-native design: the flax module is pure, parameters/optimizer state live in
a pytree, and `update`/`get_loss`/`__call__` are jit-compiled functions with
donated buffers.  Data parallelism comes from sharding the batch over a mesh
(ocrl_tpu.parallel); the same step functions run single- or multi-chip.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


def clip_by_total_norm(max_norm: float, ord: float = jnp.inf) -> optax.GradientTransformation:
    """Gradient clipping matching torch.nn.utils.clip_grad_norm_.

    The reference clips with inf-norm by default, L2 for IODINE
    (reference: ocrs/base.py:65-69, configs/ocr/iodine_large.yaml clip_norm_type).
    """

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        leaves = jax.tree.leaves(updates)
        if ord == jnp.inf or ord == float("inf"):
            total = jnp.max(jnp.stack([jnp.max(jnp.abs(g)) for g in leaves]))
        else:
            total = jnp.power(
                sum(jnp.sum(jnp.abs(g) ** ord) for g in leaves), 1.0 / ord)
        scale = jnp.minimum(1.0, max_norm / (total + 1e-6))
        updates = jax.tree.map(lambda g: g * scale, updates)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def global_norm(tree, ord: float = 2.0):
    leaves = jax.tree.leaves(tree)
    if ord == jnp.inf or ord == float("inf"):
        return jnp.max(jnp.stack([jnp.max(jnp.abs(g)) for g in leaves]))
    return jnp.power(sum(jnp.sum(jnp.abs(g) ** ord) for g in leaves), 1.0 / ord)


@dataclasses.dataclass
class ModelSpec:
    """Everything the generic wrapper needs to drive one OCR model."""

    name: str
    module: Any                                 # flax module
    rep_dim: int
    num_slots: int
    optimizer: Optional[optax.GradientTransformation]
    obs_shape: tuple                            # single-example obs shape (no batch)
    # which grad-norm to report/clip: None disables clipping
    clip: Optional[float] = None
    clip_ord: float = float("inf")
    # rng streams the module uses at train/eval time
    rng_streams: tuple = ("noise",)
    # does loss use masks / does eval need gradients (IODINE)
    uses_masks: bool = False
    # per-top-level-module gradient norms in train metrics (the reference's
    # wandb.watch gradient logging, ocrs/base.py:30-31; off by default —
    # costs a few extra reductions per step)
    log_grad_norms: bool = False


class OCR:
    """Host-side handle: owns params/opt_state and the jitted step functions.

    API mirrors the reference wrapper (ocrs/base.py): __call__, get_loss,
    update, get_samples, save/load, rep_dim, num_slots.
    """

    def __init__(self, spec: ModelSpec, seed: int = 0, mesh=None, donate: bool = True):
        self.spec = spec
        self.name = spec.name
        self.rep_dim = spec.rep_dim
        self.num_slots = spec.num_slots
        self._mesh = mesh
        self._last_step = 0

        root = jax.random.PRNGKey(seed)
        init_rng, self._rng = jax.random.split(root)
        dummy = jnp.zeros((1,) + tuple(spec.obs_shape), jnp.float32)
        rngs = {"params": init_rng}
        for i, stream in enumerate(spec.rng_streams):
            rngs[stream] = jax.random.fold_in(init_rng, i + 1)
        # init through `init_all` (every submodule) when available, else `loss`.
        # jit the init: un-jitted flax init dispatches every op individually,
        # which is pathological over a remote-device transport.
        if hasattr(spec.module, "init_all"):
            init_fn = jax.jit(partial(spec.module.init, method="init_all"))
            variables = init_fn(rngs, dummy)
        else:
            init_fn = jax.jit(partial(spec.module.init, method="loss"),
                              static_argnums=(4,))
            variables = init_fn(rngs, dummy, None, jnp.int32(0), False)
        self.params = variables.get("params", {})
        if spec.optimizer is not None:
            self.tx = spec.optimizer
            if spec.clip is not None:
                self.tx = optax.chain(clip_by_total_norm(spec.clip, spec.clip_ord), self.tx)
            self.opt_state = self.tx.init(self.params)
        else:
            self.tx = None
            self.opt_state = None

        self._build_step_fns(donate)

    # -- jitted step functions -------------------------------------------------

    def _rngs_for(self, rng):
        return {s: jax.random.fold_in(rng, i) for i, s in enumerate(self.spec.rng_streams)}

    def _step_fn_defs(self):
        """The single definition of all step functions, shared by the plain
        single-device jit below and the sharded jit in parallel.shard_ocr —
        one body, two compilation wrappers (no drift between them)."""
        spec = self.spec

        def loss_fn(params, obs, masks, step, rng, train):
            out = spec.module.apply(
                {"params": params}, obs, masks, step, train,
                rngs=self._rngs_for(rng), method="loss")
            return out  # (loss, metrics)

        def train_step(params, opt_state, obs, masks, step, rng):
            (loss, metrics), grads = jax.value_and_grad(
                lambda p: loss_fn(p, obs, masks, step, rng, True), has_aux=True)(params)
            metrics = dict(metrics)
            if spec.clip is not None:
                metrics["norm"] = global_norm(grads, spec.clip_ord)
            if spec.log_grad_norms and isinstance(grads, dict):
                for mod, sub in grads.items():
                    metrics[f"grad_norm/{mod}"] = global_norm(sub)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        def train_step_many(params, opt_state, obs, masks, step0, rng, k):
            """k optimizer steps under ONE dispatch via lax.scan.

            On a latency-bound transport every per-step dispatch/transfer
            (step scalar upload, rng split, f32 cast, step call) costs a
            round-trip; scanning k steps in one executable amortises all of
            it.  obs is the staged superbatch (k*B, ...); metrics come back
            stacked (k, ...) per key.
            """
            obs = normalize_obs(obs)  # uint8 superbatch crosses the boundary raw
            obs = obs.reshape((k, obs.shape[0] // k) + obs.shape[1:])
            if masks is not None:
                masks = masks.reshape((k, masks.shape[0] // k) + masks.shape[1:])

            def body(carry, xs):
                params, opt_state = carry
                i = xs[0]
                ob = xs[1]
                mk = xs[2] if masks is not None else None
                (loss, metrics), grads = jax.value_and_grad(
                    lambda p: loss_fn(p, ob, mk, step0 + i,
                                      jax.random.fold_in(rng, i), True),
                    has_aux=True)(params)
                metrics = dict(metrics)
                if spec.clip is not None:
                    metrics["norm"] = global_norm(grads, spec.clip_ord)
                if spec.log_grad_norms and isinstance(grads, dict):
                    for mod, sub in grads.items():
                        metrics[f"grad_norm/{mod}"] = global_norm(sub)
                updates, opt_state = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), metrics

            xs = (jnp.arange(k), obs) + ((masks,) if masks is not None else ())
            (params, opt_state), metrics = jax.lax.scan(body, (params, opt_state), xs)
            return params, opt_state, metrics

        def eval_step(params, obs, masks, step, rng):
            _, metrics = loss_fn(params, obs, masks, step, rng, False)
            return metrics

        def forward(params, obs, rng):
            return spec.module.apply({"params": params}, obs,
                                     rngs=self._rngs_for(rng))

        if hasattr(spec.module, "sample_arrays"):
            def sample_arrays(params, obs, rng):
                return spec.module.apply(
                    {"params": params}, obs, rngs=self._rngs_for(rng),
                    method="sample_arrays")
        else:
            sample_arrays = None
        return train_step, eval_step, forward, sample_arrays, train_step_many

    def _build_step_fns(self, donate: bool) -> None:
        (train_step, eval_step, forward, sample_arrays,
         train_step_many) = self._step_fn_defs()
        donate_args = (0, 1) if donate else ()
        self._train_step = jax.jit(train_step, donate_argnums=donate_args)
        self._train_step_many = jax.jit(
            train_step_many, static_argnums=(6,), donate_argnums=donate_args)
        self._eval_step = jax.jit(eval_step)
        self._forward = jax.jit(forward)
        self._sample_arrays = (
            None if sample_arrays is None else jax.jit(sample_arrays))

    def _next_rng(self):
        self._rng, rng = jax.random.split(self._rng)
        return rng

    # -- reference-parity API ----------------------------------------------------

    def __call__(self, obs):
        return self._forward(self.params, _as_f32(obs), self._next_rng())

    def get_loss(self, obs, masks=None, step=None) -> dict:
        """Eval metrics at the CURRENT training step's schedules (tau etc.),
        like the reference's eval-after-update_tau behaviour
        (reference: slate.py:53-54, train_ocr.py:72-86)."""
        if step is None:
            step = self._last_step
        metrics = self._eval_step(self.params, _as_f32(obs), _mask_arg(masks),
                                  jnp.int32(step), self._next_rng())
        return metrics

    def update(self, obs, masks, step: int) -> dict:
        self._last_step = int(step)
        if self.tx is None:
            return {}
        self.params, self.opt_state, metrics = self._train_step(
            self.params, self.opt_state, _as_f32(obs), _mask_arg(masks),
            jnp.int32(step), self._next_rng())
        return metrics

    def update_many(self, obs, masks, step: int, k: int) -> dict:
        """k optimizer steps (step .. step+k-1) in one dispatch; obs/masks are
        the staged superbatch with k*B leading rows (uint8 obs welcome — the
        f32 cast happens in-jit).  Returns metrics stacked (k,) per key."""
        self._last_step = int(step) + k - 1
        if self.tx is None:
            return {}
        self.params, self.opt_state, metrics = self._train_step_many(
            self.params, self.opt_state, obs, _mask_arg(masks),
            jnp.int32(step), self._next_rng(), k)
        return metrics

    def get_samples(self, obs) -> dict:
        if self._sample_arrays is not None:
            arrays = self._sample_arrays(self.params, _as_f32(obs), self._next_rng())
            arrays = jax.device_get(arrays)
            return self.spec.module.samples_grid(*arrays)
        if not hasattr(self.spec.module, "samples"):
            return {}
        return self.spec.module.apply(
            {"params": self.params}, _as_f32(obs),
            rngs=self._rngs_for(self._next_rng()), method="samples")

    def train(self):
        return None

    def eval(self):
        return None

    def to(self, device):
        return None

    def save(self) -> dict:
        ckpt = {"ocr_module_state_dict": self.params}
        if self.opt_state is not None:
            ckpt["ocr_opt_state_dict"] = self.opt_state
        return ckpt

    def load(self, checkpoint: dict) -> None:
        self.params = checkpoint["ocr_module_state_dict"]
        if self.opt_state is not None and "ocr_opt_state_dict" in checkpoint:
            self.opt_state = checkpoint["ocr_opt_state_dict"]


def normalize_obs(obs):
    """Images arrive as uint8 (cheap transfer) and are normalised on-device;
    float inputs are assumed already in [0, 1]."""
    obs = jnp.asarray(obs)
    if obs.dtype == jnp.uint8:
        return obs.astype(jnp.float32) / 255.0
    return obs.astype(jnp.float32)


_as_f32 = normalize_obs


def _mask_arg(masks):
    return None if masks is None else jnp.asarray(masks, jnp.float32)
