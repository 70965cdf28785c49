"""K independent NatureCNNs stacked as K slots
(reference: ocrs/multiple_cnns/multiple_cnn_module.py).

TPU-native twist: instead of a Python loop over K submodules, the K encoders
are a single vmapped NatureCNN — one fused XLA computation whose convolutions
batch over the module axis.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .naturecnn import NatureCNN_Module


class MultipleCNN_Module(nn.Module):
    ocr_config: dict
    env_config: dict

    @nn.compact
    def __call__(self, obs):
        cfg = self.ocr_config.replace(use_cnn_feat=False, cnn_feat_size=4)
        vmapped = nn.vmap(
            NatureCNN_Module,
            in_axes=None, out_axes=1,             # share the input, stack outputs
            axis_size=self.ocr_config.num_modules,
            variable_axes={"params": 0},           # independent weights per module
            split_rngs={"params": True},
        )
        return vmapped(cfg, self.env_config)(obs)  # [B, K, rep_dim]

    def loss(self, obs, masks=None, step=0, train=False):
        del masks, step, train
        rep = self(obs)
        return 0.0 * jnp.sum(rep), {}


def dims(ocr_config, env_config) -> tuple[int, int]:
    return ocr_config.rep_dim, ocr_config.num_modules
