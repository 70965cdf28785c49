"""Nature DQN CNN encoder (reference: ocrs/naturecnn/naturecnn_module.py).

E2E-only model (no self-supervised loss): a 512-d vector, or the 4x4/2x2
feature map as pseudo-slots (``use_cnn_feat``).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class NatureCNN_Module(nn.Module):
    ocr_config: dict
    env_config: dict

    @nn.compact
    def __call__(self, obs):
        use_feat = self.ocr_config.use_cnn_feat
        feat_size = self.ocr_config.get("cnn_feat_size", 4)
        x = nn.relu(nn.Conv(32, (8, 8), strides=4, padding="VALID")(obs))
        x = nn.relu(nn.Conv(64, (4, 4), strides=2, padding="VALID")(x))
        x = nn.relu(nn.Conv(64, (3, 3), strides=1, padding="VALID")(x))
        if feat_size == 2:
            x = nn.relu(nn.Conv(128, (3, 3), strides=1, padding="VALID")(x))
        if use_feat:
            return x.reshape(x.shape[0], -1, x.shape[-1])  # [B, s*s, D]
        x = x.reshape(x.shape[0], -1)
        return nn.relu(nn.Dense(self.ocr_config.rep_dim)(x))

    def loss(self, obs, masks=None, step=0, train=False):
        """No pretraining loss (reference: naturecnn_module.py:66-74); the
        forward pass still runs so init creates all parameters."""
        del masks, step, train
        rep = self(obs)
        return 0.0 * jnp.sum(rep), {}


def dims(ocr_config, env_config) -> tuple[int, int]:
    if ocr_config.use_cnn_feat:
        if ocr_config.cnn_feat_size == 4:
            return 64, 16
        if ocr_config.cnn_feat_size == 2:
            return 128, 4
        raise ValueError("cnn_feat_size must be 2 or 4")
    return ocr_config.rep_dim, 1
