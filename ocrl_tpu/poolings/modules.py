"""Pooling modules: set-of-slots -> single feature vector
(reference: poolings/*/??_module.py).

All are pure flax modules constructed with
(ocr_rep_dim, ocr_num_slots, config, num_stacked_obss), mirroring the
reference module signatures (sb3s/ocr_extractor.py:32-34), so they compose
directly into jitted policies and classifier heads.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..utils.viz import slot_to_img
from ..models.common import MLP


# -- torch-parity transformer encoder (post-LN, d_ff=2048 defaults) -------------

class TorchEncoderLayer(nn.Module):
    """nn.TransformerEncoderLayer work-alike (post-norm, ReLU, d_ff 2048),
    which is what the reference's pooling transformer uses
    (poolings/common/transformer.py:15-19)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic=True):
        y = nn.MultiHeadDotProductAttention(num_heads=self.nhead)(x, x)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5)(x + y)
        y = nn.Dense(self.dim_feedforward)(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = nn.Dense(self.d_model)(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5)(x + y)


def sinusoid_table(max_len: int, d_model: int, scale: float = 1.0) -> np.ndarray:
    position = np.arange(max_len)[:, None]
    div = np.exp(np.arange(0, d_model, 2) * (-math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), np.float32)
    pe[:, 0::2] = np.sin(position * div) * scale
    pe[:, 1::2] = np.cos(position * div) * scale
    return pe


class CoreTransformer(nn.Module):
    """linear proj -> CLS token -> encoder stack -> CLS output
    (reference: poolings/common/transformer.py:9-33)."""

    d_model: int
    nhead: int
    num_layers: int
    pos_table: Optional[Any] = None  # [max_len, d_model] added before encoder

    @nn.compact
    def __call__(self, state, deterministic=True):
        B, S, D = state.shape
        x = nn.Dense(self.d_model)(state)
        cls = self.param("cls_token", nn.initializers.zeros, (self.d_model,))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.d_model)), x], axis=1)
        if self.pos_table is not None:
            x = x + jnp.asarray(self.pos_table)[None, : x.shape[1]]
        for _ in range(self.num_layers):
            x = TorchEncoderLayer(self.d_model, self.nhead)(x, deterministic)
        return x[:, 0]


class Transformer_Module(nn.Module):
    """reference: poolings/transformer/transformer_module.py."""

    ocr_rep_dim: int
    ocr_num_slots: int
    config: Any
    num_stacked_obss: int = 1

    @nn.compact
    def __call__(self, state, deterministic=True):
        cfg = self.config
        d_model = cfg.d_model
        in_dim = self.ocr_rep_dim

        if cfg.get("push_embedding"):
            max_len = 10_000_000
            color = nn.Embed(10, 128)(state[:, :, 0].astype(jnp.int32))
            shape = nn.Embed(10, 128)(state[:, :, 1].astype(jnp.int32))
            pos = _sinusoid_lookup(state[:, :, -2:], d_model, max_len)
            state = jnp.concatenate([color, shape, pos[:, :, 0], pos[:, :, 1]], -1)
            state = nn.Dense(128)(state)
            in_dim = 128
        if cfg.get("cw_embedding"):
            max_len = 10_000
            B, K, _ = state.shape
            arm = _sinusoid_lookup(state[:, 0, :28], d_model, max_len)  # [B,28,d]
            arm = nn.Dense(128, name="arm_emb")(arm.reshape(B, -1))
            objs = state[:, 1:, 28:]
            obj_pos = _sinusoid_lookup(objs[:, :, :3].reshape(B, -1, 3).reshape(-1, 3),
                                       d_model, max_len).reshape(B, K - 1, -1)
            obj_colors = objs[:, :, 7:10]
            obj = nn.Dense(128, name="obj_emb")(
                jnp.concatenate([obj_pos, obj_colors], axis=-1))
            state = jnp.concatenate([arm[:, None], obj], axis=1)
            in_dim = 128
        if cfg.get("use_mlp1"):
            state = nn.Dense(128)(nn.relu(nn.Dense(64)(state)))
            in_dim = 128
        elif cfg.get("use_mlp2"):
            h = nn.relu(nn.Dense(64)(state))
            h = nn.relu(nn.Dense(64)(h))
            state = nn.Dense(128)(h)
            in_dim = 128

        pos_table = None
        n_tokens = self.ocr_num_slots * self.num_stacked_obss + 1
        if self.num_stacked_obss > 1:
            # per-frame positions, CLS at slot 0 (reference:
            # poolings/common/transformer.py:85-126)
            position = np.repeat(np.arange(self.ocr_num_slots), self.num_stacked_obss)
            position = np.concatenate([[0], position + 1])
            base = sinusoid_table(int(position.max()) + 1, cfg.d_model, 0.001)
            pos_table = base[position]
        elif cfg.get("pos_emb") in ("ape", "lpe"):
            pos_table = sinusoid_table(n_tokens, cfg.d_model, 0.001)

        return CoreTransformer(cfg.d_model, cfg.nhead, cfg.num_layers,
                               pos_table)(state, deterministic)


def _sinusoid_lookup(x, d_model, max_len):
    """Quantise coords in [-1,1] to sinusoid-table rows, computed
    ANALYTICALLY (reference: transformer_module.py:72-86 materialises a
    (max_len+1, d_model) table — ~5GB at max_len=10M, d_model=128; the row
    for integer position p is just sin/cos(p * div), so we evaluate it in
    O(1) memory; values are identical — see
    tests/test_poolings.py::test_sinusoid_lookup_matches_table)."""
    x = jnp.clip((x + 1) / 2, 0.0, 1.0)
    idx = jnp.floor(x * max_len).astype(jnp.int32)
    idx = jnp.clip(idx, 0, max_len)
    div = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32)
                  * (-math.log(10000.0) / d_model))
    ang = idx[..., None].astype(jnp.float32) * div          # [..., d_model/2]
    pe = jnp.zeros(idx.shape + (d_model,), jnp.float32)
    pe = pe.at[..., 0::2].set(jnp.sin(ang))
    pe = pe.at[..., 1::2].set(jnp.cos(ang))
    return pe


class RN_Module(nn.Module):
    """Relation network over ordered slot pairs (reference: poolings/rn)."""

    ocr_rep_dim: int
    ocr_num_slots: int
    config: Any
    num_stacked_obss: int = 1

    @nn.compact
    def __call__(self, state, deterministic=True):
        B, S, D = state.shape
        idx = np.array([(i, j) for i in range(S) for j in range(S) if i != j])
        left = state[:, idx[:, 0]]
        right = state[:, idx[:, 1]]
        pairs = jnp.concatenate([left, right], axis=-1)  # [B, S*(S-1), 2D]
        g = pairs
        for dim in self.config.g_dims:
            g = nn.relu(nn.Dense(dim)(g))
        pooled = g.sum(axis=1)
        f = pooled
        for dim in self.config.f_dims:
            f = nn.relu(nn.Dense(dim)(f))
        return f


class MLP_Module(nn.Module):
    """Flatten slots -> MLP (reference: poolings/mlp)."""

    ocr_rep_dim: int
    ocr_num_slots: int
    config: Any
    num_stacked_obss: int = 1

    @nn.compact
    def __call__(self, state, deterministic=True):
        if state.ndim == 3:
            state = state.reshape(state.shape[0], -1)
        return MLP(self.config.dims, self.config.acts)(state)


class PoolNatureCNN(nn.Module):
    """Nature CNN over the slot grid (reference: poolings/common/naturecnn.py)."""

    rep_dim: Optional[int]
    use_cnn_feat: bool

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(32, (8, 8), strides=4, padding="VALID")(x))
        x = nn.relu(nn.Conv(64, (4, 4), strides=2, padding="VALID")(x))
        x = nn.relu(nn.Conv(64, (3, 3), strides=1, padding="VALID")(x))
        if self.use_cnn_feat:
            return x
        x = x.reshape(x.shape[0], -1)
        return nn.relu(nn.Dense(self.rep_dim)(x))


class CNN_Linear_Module(nn.Module):
    """slots -> grid image -> NatureCNN -> vector (reference: poolings/cnn_linear)."""

    ocr_rep_dim: int
    ocr_num_slots: int
    config: Any
    num_stacked_obss: int = 1

    @nn.compact
    def __call__(self, state, deterministic=True):
        return PoolNatureCNN(self.config.rep_dim, False)(slot_to_img(state))


class CNN_Transformer_Module(nn.Module):
    """slots -> grid -> CNN feature map -> CLS transformer
    (reference: poolings/cnn_transformer)."""

    ocr_rep_dim: int
    ocr_num_slots: int
    config: Any
    num_stacked_obss: int = 1

    @nn.compact
    def __call__(self, state, deterministic=True):
        feat = PoolNatureCNN(None, True)(slot_to_img(state))
        B = feat.shape[0]
        tokens = feat.reshape(B, -1, feat.shape[-1])
        pos_table = None
        if self.config.get("pos_emb") in ("ape", "lpe"):
            pos_table = sinusoid_table(self.ocr_num_slots + 1, self.config.d_model, 0.001)
        return CoreTransformer(self.config.d_model, self.config.nhead,
                               self.config.num_layers, pos_table)(tokens, deterministic)


class Identity_Module(nn.Module):
    """Flatten/concat slots (reference: poolings/identity)."""

    ocr_rep_dim: int
    ocr_num_slots: int
    config: Any
    num_stacked_obss: int = 1

    @nn.compact
    def __call__(self, state, deterministic=True):
        if state.ndim == 3:
            return state.reshape(state.shape[0], -1)
        return state


_MODULES = {
    "Transformer": Transformer_Module,
    "RN": RN_Module,
    "MLP": MLP_Module,
    "CNN_Linear": CNN_Linear_Module,
    "CNN_Transformer": CNN_Transformer_Module,
    "Identity": Identity_Module,
}


def pooled_dim(name: str, config, ocr_rep_dim: int, ocr_num_slots: int,
               num_stacked_obss: int = 1) -> int:
    """Output feature size of a pooling (reference modules' self.rep_dim)."""
    if name == "Transformer":
        return config.d_model
    if name == "RN":
        return config.f_dims[-1]
    if name == "MLP":
        return config.dims[-1]
    if name == "CNN_Linear":
        return config.rep_dim
    if name == "CNN_Transformer":
        return config.d_model
    if name == "Identity":
        return ocr_rep_dim * ocr_num_slots * num_stacked_obss
    raise ValueError(f"Unknown pooling '{name}'")


def create_pooling_module(name: str, ocr_rep_dim: int, ocr_num_slots: int,
                          config, num_stacked_obss: int = 1):
    from ocrl_tpu.config.node import StaticConfig

    if name not in _MODULES:
        raise ValueError(f"Unknown pooling '{name}'. Available: {sorted(_MODULES)}")
    return _MODULES[name](ocr_rep_dim, ocr_num_slots, StaticConfig(config),
                          num_stacked_obss)
