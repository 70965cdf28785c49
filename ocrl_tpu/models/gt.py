"""Ground-truth state pass-through with optional MLP head
(reference: ocrs/gt/gt_module.py)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .common import MLP


class GT_Module(nn.Module):
    ocr_config: dict
    env_config: dict

    @nn.compact
    def __call__(self, obs):
        if len(self.ocr_config.dims) == 0:
            return obs
        return MLP(self.ocr_config.dims, self.ocr_config.acts)(obs)

    def loss(self, obs, masks=None, step=0, train=False):
        del masks, step, train
        rep = self(obs)
        return 0.0 * jnp.sum(rep), {}


def dims(ocr_config, env_config) -> tuple[int, int]:
    # Push/Maze states carry an extra goal row (reference: gt_module.py:9-12)
    if "Push" in env_config.name or "Maze" in env_config.name:
        num_slots = env_config.num_objects_range[1] + 2
    else:
        num_slots = env_config.num_objects_range[1] + 1
    rep_dim = ocr_config.dims[-1] if len(ocr_config.dims) > 0 else env_config.state_size
    return rep_dim, num_slots
