"""OCR model registry (reference: ocrs/__init__.py, train_ocr.py:37).

``create_ocr(ocr_config, env_config, seed)`` builds the flax module, its
optimizer, and the generic jitted wrapper.  `env_config` is either an env
config or a dataset config — both carry obs_size/obs_channels.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

from .base import OCR, ModelSpec

_REGISTRY = {}


def register(name):
    def wrap(builder):
        _REGISTRY[name] = builder
        return builder
    return wrap


def create_ocr(ocr_config, env_config, seed: int = 0) -> OCR:
    name = ocr_config.name
    if name not in _REGISTRY:
        raise ValueError(f"Unknown OCR model '{name}'. Available: {sorted(_REGISTRY)}")
    spec = build_spec(ocr_config, env_config)
    learning = ocr_config.get("learning")
    if learning is not None and learning.get("log_grad_norms"):
        spec.log_grad_norms = True
    return OCR(spec, seed=seed)


def build_spec(ocr_config, env_config) -> ModelSpec:
    from ocrl_tpu.config.node import StaticConfig

    name = ocr_config.name
    if name not in _REGISTRY:
        raise ValueError(f"Unknown OCR model '{name}'. Available: {sorted(_REGISTRY)}")
    return _REGISTRY[name](StaticConfig(ocr_config), StaticConfig(env_config))


def _img_shape(env_config):
    stacked = env_config.get("num_stacked_obss", 1)
    return (env_config.obs_size, env_config.obs_size,
            env_config.obs_channels * stacked)


def _default_optimizer(ocr_config):
    learning = ocr_config.get("learning")
    if learning is None or learning.get("lr") is None:
        return None
    return optax.adam(learning.lr)


def _clip_args(ocr_config):
    learning = ocr_config.get("learning")
    if learning is None or learning.get("clip") is None:
        return None, float("inf")
    return learning.clip, float(learning.get("clip_norm_type", float("inf")))


@register("VAE")
def _build_vae(ocr_config, env_config) -> ModelSpec:
    from . import vae

    rep_dim, num_slots = vae.dims(ocr_config, env_config)
    clip, clip_ord = _clip_args(ocr_config)
    return ModelSpec(
        name="VAE",
        module=vae.VAE_Module(ocr_config, env_config),
        rep_dim=rep_dim, num_slots=num_slots,
        optimizer=_default_optimizer(ocr_config),
        obs_shape=_img_shape(env_config),
        clip=clip, clip_ord=clip_ord,
    )


@register("NatureCNN")
def _build_naturecnn(ocr_config, env_config) -> ModelSpec:
    from . import naturecnn

    rep_dim, num_slots = naturecnn.dims(ocr_config, env_config)
    return ModelSpec(
        name="NatureCNN",
        module=naturecnn.NatureCNN_Module(ocr_config, env_config),
        rep_dim=rep_dim, num_slots=num_slots,
        optimizer=_default_optimizer(ocr_config),
        obs_shape=_img_shape(env_config),
    )


@register("MultipleCNN")
def _build_multiple_cnn(ocr_config, env_config) -> ModelSpec:
    from . import multiple_cnn

    rep_dim, num_slots = multiple_cnn.dims(ocr_config, env_config)
    return ModelSpec(
        name="MultipleCNN",
        module=multiple_cnn.MultipleCNN_Module(ocr_config, env_config),
        rep_dim=rep_dim, num_slots=num_slots,
        optimizer=_default_optimizer(ocr_config),
        obs_shape=_img_shape(env_config),
    )


@register("GT")
def _build_gt(ocr_config, env_config) -> ModelSpec:
    from . import gt

    rep_dim, num_slots = gt.dims(ocr_config, env_config)
    return ModelSpec(
        name="GT",
        module=gt.GT_Module(ocr_config, env_config),
        rep_dim=rep_dim, num_slots=num_slots,
        optimizer=None,
        obs_shape=(num_slots, env_config.state_size),
    )


@register("SLATE")
def _build_slate(ocr_config, env_config) -> ModelSpec:
    from . import slate

    return slate.build_spec(ocr_config, env_config)


@register("Iodine")
def _build_iodine(ocr_config, env_config) -> ModelSpec:
    from . import iodine

    return iodine.build_spec(ocr_config, env_config)


@register("MAE")
def _build_mae(ocr_config, env_config) -> ModelSpec:
    from . import mae

    return mae.build_spec(ocr_config, env_config)
