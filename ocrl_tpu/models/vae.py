"""Convolutional VAE (reference: ocrs/vaes/vae_module.py, ocrs/common/models.py:49-93).

Two representation modes: the latent mean vector (num_slots=1) or the 4x4 CNN
feature map as 16 pseudo-slots (``use_cnn_feat``).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..utils.viz import for_viz, img_to_slot
from .common import Conv2dBlock, conv2d, pixel_shuffle


class VAEEncoder(nn.Module):
    """log2(compression) stride-2 conv stages -> 1x1 to out_dim
    (reference: common/models.py:49-69)."""

    out_dim: int
    compression_rate: int

    @nn.compact
    def __call__(self, x):
        assert math.log2(self.compression_rate).is_integer()
        for _ in range(int(math.log2(self.compression_rate))):
            x = Conv2dBlock(64, 2, 2)(x)
            x = Conv2dBlock(64, 1, 1)(x)
            x = Conv2dBlock(64, 1, 1)(x)
            x = Conv2dBlock(64, 1, 1)(x)
        return conv2d(self.out_dim, 1)(x)


class VAEDecoder(nn.Module):
    """PixelShuffle upsampling stages (reference: common/models.py:73-93)."""

    obs_channels: int
    compression_rate: int

    @nn.compact
    def __call__(self, x):
        assert math.log2(self.compression_rate).is_integer()
        x = Conv2dBlock(64, 1)(x)
        for _ in range(int(math.log2(self.compression_rate))):
            x = Conv2dBlock(64, 3, 1, 1)(x)
            x = Conv2dBlock(64, 1, 1)(x)
            x = Conv2dBlock(64, 1, 1)(x)
            x = Conv2dBlock(64 * 2 * 2, 1)(x)
            x = pixel_shuffle(x, 2)
        return conv2d(self.obs_channels, 1)(x)


class VAE_Module(nn.Module):
    ocr_config: dict
    env_config: dict

    def setup(self):
        obs_size = self.env_config.obs_size
        self._cnn_feat_size = self.ocr_config.cnn_feat_size
        self._use_cnn_feat = self.ocr_config.use_cnn_feat
        self._latent_dim = self.ocr_config.latent_dim
        self._kld_weight = self.ocr_config.learning.kld_weight
        compression = obs_size // self._cnn_feat_size
        self.enc = VAEEncoder(64, compression)
        self.mu = nn.Dense(self._latent_dim)
        self.var = nn.Dense(self._latent_dim)
        self.in_dec = nn.Dense(64 * self._cnn_feat_size ** 2)
        self.dec = VAEDecoder(self.env_config.obs_channels, compression)

    def _encode(self, obs):
        out = self.enc(obs)  # [B, s, s, 64]
        flat = out.reshape(out.shape[0], -1)
        return out, self.mu(flat), self.var(flat)

    def __call__(self, obs):
        feat, mu, _ = self._encode(obs)
        return img_to_slot(feat) if self._use_cnn_feat else mu

    def _decode(self, latent):
        s = self._cnn_feat_size
        grid = self.in_dec(latent).reshape(latent.shape[0], s, s, 64)
        return self.dec(grid)

    def loss(self, obs, masks=None, step=0, train=False):
        del masks, step
        feat, mu, log_var = self._encode(obs)
        eps = jax.random.normal(self.make_rng("noise"), mu.shape, mu.dtype)
        latent = mu + eps * jnp.exp(0.5 * log_var)
        recon = self._decode(latent)
        mse = jnp.sum((obs - recon) ** 2) / obs.shape[0]
        kld = jnp.mean(-0.5 * jnp.sum(1 + log_var - mu ** 2 - jnp.exp(log_var), axis=1))
        loss = mse + self._kld_weight * kld
        return loss, {"loss": loss, "mse": mse, "kld": -kld}

    def sample_arrays(self, obs):
        _, mu, log_var = self._encode(obs)
        eps = jax.random.normal(self.make_rng("noise"), mu.shape, mu.dtype)
        recon = self._decode(mu + eps * jnp.exp(0.5 * log_var))
        return obs, recon

    @staticmethod
    def samples_grid(obs, recon) -> dict:
        return {"samples": np.concatenate([for_viz(obs), for_viz(recon)], axis=-3)}


def dims(ocr_config, env_config) -> tuple[int, int]:
    if ocr_config.use_cnn_feat:
        return 64, ocr_config.cnn_feat_size ** 2
    return ocr_config.latent_dim, 1
