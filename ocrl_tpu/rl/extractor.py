"""Policy construction: OCR extractor + pooling + AC heads
(reference: sb3s/ocr_extractor.py, train_sb3.py:78-101).

Pretrained-OCR semantics match the reference's get_ocr
(utils/tools.py:323-347): a configured checkpoint makes the OCR frozen unless
``finetuning``; without a checkpoint the OCR trains end-to-end with the policy
(that's the "E2E" regimes of the benchmark).
"""

from __future__ import annotations

import jax

from ocrl_tpu.config.node import StaticConfig
from ocrl_tpu.poolings import create_pooling_module, get_ocr
from .ac_nets import ActorCriticPolicy


def build_policy(config, seed: int = 0):
    """-> (policy_module, ocr, freeze_ocr, pretrained)."""
    env_cfg = config.env
    ocr, pretrained = get_ocr(config.ocr, env_cfg,
                              config.pooling.ocr_checkpoint, seed=seed)
    finetuning = config.pooling.ocr_checkpoint.get("finetuning", False)
    freeze = pretrained and not finetuning
    pooling_module = create_pooling_module(
        config.pooling.name, ocr.rep_dim, ocr.num_slots, config.pooling,
        env_cfg.get("num_stacked_obss", 1))
    policy = ActorCriticPolicy(
        ocr_module=ocr.spec.module,
        pooling_module=pooling_module,
        acnet_config=StaticConfig(config.sb3_acnet),
        num_actions=4,
        freeze_ocr=freeze,
        ortho_init=config.sb3_acnet.ortho_init,
    )
    return policy, ocr, freeze, pretrained


def build_sac_policy(config, action_space, seed: int = 0):
    """-> (SACPolicy module, ocr, freeze_ocr, pretrained) for continuous-action
    tasks (reference: configs/sb3/sac.yaml + train_sb3.py:97)."""
    from .sac import SACPolicy

    env_cfg = config.env
    ocr, pretrained = get_ocr(config.ocr, env_cfg,
                              config.pooling.ocr_checkpoint, seed=seed)
    finetuning = config.pooling.ocr_checkpoint.get("finetuning", False)
    freeze = pretrained and not finetuning
    pooling_module = create_pooling_module(
        config.pooling.name, ocr.rep_dim, ocr.num_slots, config.pooling,
        env_cfg.get("num_stacked_obss", 1))
    policy = SACPolicy(
        ocr_module=ocr.spec.module,
        pooling_module=pooling_module,
        action_dim=int(action_space.shape[0]),
        freeze_ocr=freeze,
    )
    return policy, ocr, freeze, pretrained


def inject_pretrained_ocr(algo, ocr) -> None:
    """Replace the policy's fresh OCR params with the pretrained ones."""
    import jax
    import jax.numpy as jnp

    params = dict(algo.params)
    if hasattr(algo, "S"):  # MultiSeedPPO: stacked leading seed axis
        params["ocr_module"] = jax.tree.map(
            lambda x: jnp.broadcast_to(jnp.asarray(x), (algo.S,) + x.shape) + 0,
            ocr.params)
        algo.params = params
        algo.opt_state = jax.jit(jax.vmap(algo.tx.init))(algo.params)
        return
    params["ocr_module"] = ocr.params
    algo.params = params
    algo.opt_state = algo.tx.init(algo.params)
