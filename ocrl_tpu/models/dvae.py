"""Discrete VAE and spatial-broadcast decoder for SLATE / Slot-Attention
(reference: ocrs/common/models.py:10-45, 96-141)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import Conv2dBlock, PositionalEmbedding, conv2d, gumbel_softmax, pixel_shuffle


class dVAE(nn.Module):
    """Gumbel-softmax discrete VAE over a 4x-downsampled token grid
    (reference: models.py:10-45)."""

    vocab_size: int
    img_channels: int
    dtype: Any = None    # conv COMPUTE dtype (bf16 halves HBM traffic);
    # logits/outputs are cast back to f32 before softmax/MSE

    def setup(self):
        dt = self.dtype
        self.encoder = nn.Sequential([
            Conv2dBlock(64, 4, 4, dtype=dt),
            Conv2dBlock(64, 1, 1, dtype=dt), Conv2dBlock(64, 1, 1, dtype=dt),
            Conv2dBlock(64, 1, 1, dtype=dt), Conv2dBlock(64, 1, 1, dtype=dt),
            Conv2dBlock(64, 1, 1, dtype=dt), Conv2dBlock(64, 1, 1, dtype=dt),
            conv2d(self.vocab_size, 1, dtype=dt),
        ])
        self.decoder_blocks = [
            Conv2dBlock(64, 1, dtype=dt),
            Conv2dBlock(64, 3, 1, 1, dtype=dt), Conv2dBlock(64, 1, 1, dtype=dt),
            Conv2dBlock(64, 1, 1, dtype=dt),
            Conv2dBlock(64 * 2 * 2, 1, dtype=dt),    # -> pixel_shuffle(2)
            Conv2dBlock(64, 3, 1, 1, dtype=dt), Conv2dBlock(64, 1, 1, dtype=dt),
            Conv2dBlock(64, 1, 1, dtype=dt),
            Conv2dBlock(64 * 2 * 2, 1, dtype=dt),    # -> pixel_shuffle(2)
        ]
        self.decoder_out = conv2d(self.img_channels, 1, dtype=dt)

    def __call__(self, obs, tau=1.0, hard=True):
        """obs: [B,H,W,C] -> (z [B,h,w,vocab] one-hot-ish, z_logits).

        The reference log_softmaxes the logits before gumbel sampling
        (models.py:40); both the soft sample softmax((x+g)/tau) and the hard
        argmax are invariant to that per-row constant, so it is skipped here
        — one full 4096-way softmax less per step.

        The soft sample runs as a fused Pallas kernel with on-chip PRNG on
        TPU (ocrl_tpu/ops/gumbel.py).
        """
        z_logits = self.encoder(obs).astype(jnp.float32)
        if hard:
            z = gumbel_softmax(self.make_rng("noise"), z_logits, tau, True, axis=-1)
        else:
            from ..ops import gumbel_softmax_sample

            B, H, W, V = z_logits.shape
            z = gumbel_softmax_sample(
                z_logits.reshape(-1, V), self.make_rng("noise"), tau
            ).reshape(B, H, W, V)
        return z, z_logits

    def encode_logits(self, obs):
        return self.encoder(obs).astype(jnp.float32)

    def decode(self, z):
        x = z
        for i, block in enumerate(self.decoder_blocks):
            x = block(x)
            if i in (4, 8):
                x = pixel_shuffle(x, 2)
        return self.decoder_out(x).astype(jnp.float32)


class SlotAttnCNNEncoder(nn.Module):
    """Full-resolution CNN feature extractor (reference: models.py:96-107)."""

    hidden_size: int
    dtype: Any = None

    @nn.compact
    def __call__(self, obs):
        x = Conv2dBlock(self.hidden_size, 5, 1, 2, dtype=self.dtype)(obs)
        x = Conv2dBlock(self.hidden_size, 5, 1, 2, dtype=self.dtype)(x)
        x = Conv2dBlock(self.hidden_size, 5, 1, 2, dtype=self.dtype)(x)
        out = conv2d(self.hidden_size, 5, 1, 2, dtype=self.dtype)(x)
        return out.astype(jnp.float32)  # slot attention runs f32


class BroadCastDecoder(nn.Module):
    """Spatial-broadcast decoder: per-slot RGB+alpha, softmax-composited
    (reference: models.py:110-141)."""

    obs_size: int
    obs_channels: int
    hidden_size: int
    slot_size: int
    dtype: Any = None

    def setup(self):
        # conv1 is held OUTSIDE its relu so __call__ can exploit linearity
        # (checkpoints from the earlier blocks/layers_* layout are migrated
        # by utils.checkpoint.migrate_bcdec_tree)
        self.conv1 = conv2d(self.hidden_size, 5, 1, 2, weight_init="kaiming",
                            dtype=self.dtype)
        self.rest = nn.Sequential([
            Conv2dBlock(self.hidden_size, 5, 1, 2, dtype=self.dtype),
            Conv2dBlock(self.hidden_size, 5, 1, 2, dtype=self.dtype),
            conv2d(self.obs_channels + 1, 3, 1, 1, dtype=self.dtype),
        ])
        self.pos_emb = PositionalEmbedding(self.obs_size, self.slot_size)

    def __call__(self, slots, with_components=False):
        """slots: [B,N,D] -> composited recon [B,H,W,C]
        (+ per-slot rgb/masks when with_components).

        The first conv layer is restructured EXACTLY (same math, fewer
        FLOPs): its input `broadcast(slot) + pos` is spatially constant per
        (b,n) except for the shared positional projection, and conv is
        linear, so
            conv1(broadcast(s) + pos) = conv1(broadcast(s)) + conv1(pos) - b
        with the slot term evaluated on a 5x5 grid (a 5x5 SAME conv on a 5x5
        constant image realises every border in-bounds pattern) and tiled
        back to HxW.  This removes the [B*N,H,W,D] broadcast activation
        (~380MB at SLATE shapes) and a ~300 GFLOP conv from the step
        (reference semantics: models.py:110-141 — unchanged)."""
        B, N, D = slots.shape
        H = W = self.obs_size
        # pos_emb(x) = x + proj, proj shared [1,H,W,D]
        proj = self.pos_emb(jnp.zeros((1, H, W, D), slots.dtype))
        bias = self.conv1(jnp.zeros((1, 1, 1, D), slots.dtype))
        # ^ pad-2 conv of a 1x1 zero input: every tap sees zeros -> exactly b
        small = self.conv1(jnp.broadcast_to(
            slots.reshape(B * N, 1, 1, D), (B * N, 5, 5, D)))
        posc = self.conv1(proj)
        k = 5 // 2
        idx = jnp.concatenate([jnp.arange(k), jnp.full((H - 2 * k,), k),
                               jnp.arange(k + 1, 2 * k + 1)]).astype(jnp.int32)
        slot_part = small[:, idx][:, :, idx]          # [B*N,H,W,hidden]
        out = self.rest(nn.relu(slot_part + posc - bias)).astype(jnp.float32)
        img_slots = out[..., : self.obs_channels].reshape(B, N, H, W, self.obs_channels)
        masks = out[..., -1:].reshape(B, N, H, W, 1)
        masks = jax.nn.softmax(masks, axis=1)
        recon = jnp.sum(img_slots * masks, axis=1)
        if with_components:
            return recon, img_slots, masks
        return recon
