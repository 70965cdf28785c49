"""Actor-critic heads and the full policy module.

Work-alikes of the reference's CustomNetwork / CustomActorCriticPolicy
(reference: sb3s/custom_acnets.py) plus the OCRExtractor composition
(reference: sb3s/ocr_extractor.py): obs -> OCR -> pooling -> shared/policy/
value MLPs -> categorical logits + value.  The whole policy is ONE flax
module, so rollout inference and PPO updates are single jitted programs —
the "jit-fused extractor chain" the north star asks for (BASELINE.json).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class CustomNetwork(nn.Module):
    """Config-driven shared/policy/value MLPs (reference: custom_acnets.py:8-96)."""

    acnet_config: Any

    def setup(self):
        cfg = self.acnet_config
        init = nn.initializers.orthogonal(np.sqrt(2)) if cfg.ortho_init else None

        def mlp(net_cfg, name):
            layers = []
            for i, (dim, act) in enumerate(zip(net_cfg.dims, net_cfg.acts)):
                kwargs = {"kernel_init": init} if init is not None else {}
                layers.append(nn.Dense(dim, name=f"{name}_{i}", **kwargs))
                layers.append({"relu": nn.relu, "tanh": nn.tanh}[act])
            return layers

        self.shared_layers = mlp(cfg.shared_net, "shared")
        self.policy_layers = mlp(cfg.policy_net, "policy")
        self.value_layers = mlp(cfg.value_net, "value")

    @staticmethod
    def _run(layers, x):
        for layer in layers:
            x = layer(x)
        return x

    def __call__(self, features):
        shared = self._run(self.shared_layers, features)
        return (self._run(self.policy_layers, shared),
                self._run(self.value_layers, shared))


class ActorCriticPolicy(nn.Module):
    """OCR extractor + pooling + AC heads -> (logits, value)."""

    ocr_module: Any
    pooling_module: Any
    acnet_config: Any
    num_actions: int
    freeze_ocr: bool = True
    ortho_init: bool = False

    def setup(self):
        self.acnet = CustomNetwork(self.acnet_config)
        if self.acnet_config.ortho_init:
            action_init = nn.initializers.orthogonal(0.01)
            value_init = nn.initializers.orthogonal(1.0)
        else:
            action_init = value_init = nn.initializers.lecun_normal()
        self.action_net = nn.Dense(self.num_actions, kernel_init=action_init)
        self.value_net_out = nn.Dense(1, kernel_init=value_init)

    def extract(self, obs):
        return self.pooling_module(self.ocr_rep(obs))

    def ocr_rep(self, obs):
        """OCR representation alone — the split point the cached-frozen-reps
        PPO update uses (rl/multi_seed.py): with a frozen encoder the rep can
        be computed ONCE per rollout instead of n_epochs x minibatches
        times."""
        rep = self.ocr_module(obs)
        if self.freeze_ocr:
            rep = jax.lax.stop_gradient(rep)
        return rep

    def heads_from_rep(self, rep):
        """pooling + AC heads from a precomputed OCR representation."""
        features = self.pooling_module(rep)
        latent_pi, latent_vf = self.acnet(features)
        logits = self.action_net(latent_pi)
        value = self.value_net_out(latent_vf)[..., 0]
        return logits, value

    def __call__(self, obs):
        return self.heads_from_rep(self.ocr_rep(obs))
