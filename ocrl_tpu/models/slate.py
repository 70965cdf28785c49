"""SLATE: dVAE + slot attention + autoregressive transformer decoder
(reference: ocrs/slate/slate_module.py, ocrs/slate/slate.py).

``use_bcdec=True`` swaps the transformer decoder for a spatial-broadcast MSE
decoder — that configuration IS the benchmark's "Slot-Attention" model
(reference: for_running.json "slotattention-*" entries).

TPU-native design choices:
  * every path (loss, slots, autoregressive generation) is one jitted XLA
    program — no Python loops over tokens or iterations;
  * generation uses per-block KV caches + precomputed cross-attention K/V
    under ``lax.scan`` (the reference re-runs full attention over the whole
    prefix per token, slate_module.py:163-179);
  * ARI is computed on-device (no sklearn round-trip as in tools.py:309-320).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils.metrics import calculate_ari
from ..utils.viz import for_viz, visualize
from .base import ModelSpec
from .common import cosine_anneal, gumbel_softmax, linear, linear_warmup, xavier_uniform
from .common import PositionalEmbedding
from .dvae import BroadCastDecoder, SlotAttnCNNEncoder, dVAE
from .slot_attention import SlotAttentionEncoder
from .transformer import LearnedPositionalEncoding, TransformerDecoder


class SLATE_Module(nn.Module):
    ocr_config: dict
    env_config: dict

    def setup(self):
        ocr, env = self.ocr_config, self.env_config
        self._obs_size = env.obs_size
        self._obs_channels = env.obs_channels
        self._use_bcdec = ocr.use_bcdec
        self._use_cnn_feat = ocr.use_cnn_feat
        self._vocab_size = ocr.dvae.vocab_size
        self._d_model = ocr.dvae.d_model
        self._enc_size = env.obs_size // 4
        self._hard = ocr.hard
        self._dropout = ocr.learning.dropout

        # `ocr.amp=bf16` runs the conv stacks (dVAE enc/dec, CNN encoder,
        # broadcast decoder) in bf16 COMPUTE with f32 params/loss — the step
        # is HBM-bound at batch 24 (docs/PARITY.md roofline) and these are
        # its biggest activation streams.  Default off: bit-parity with the
        # reference's fp32 training.
        amp = ocr.get("amp") if hasattr(ocr, "get") else None
        cdt = jnp.bfloat16 if amp == "bf16" else None
        self.dvae = dVAE(self._vocab_size, self._obs_channels, dtype=cdt)
        self.enc = SlotAttnCNNEncoder(ocr.cnn.hidden_size, dtype=cdt)
        self.enc_pos = PositionalEmbedding(env.obs_size, ocr.cnn.hidden_size)
        self.slotattn = SlotAttentionEncoder(
            num_iterations=ocr.slotattr.num_iterations,
            num_slots=ocr.slotattr.num_slots,
            input_channels=ocr.cnn.hidden_size,
            slot_size=ocr.slotattr.slot_size,
            mlp_hidden_size=ocr.slotattr.mlp_hidden_size,
            num_heads=ocr.slotattr.num_slot_heads,
            fused=ocr.slotattr.get("fused", "never"),
        )
        if self._use_bcdec:
            self.bcdec = BroadCastDecoder(
                env.obs_size, self._obs_channels, ocr.cnn.hidden_size,
                ocr.slotattr.slot_size, dtype=cdt)
        self.slotproj = linear(self._d_model, bias=False)
        self.dictionary = nn.Embed(self._vocab_size, self._d_model)
        self.bos = self.param("bos", xavier_uniform(), (1, 1, self._d_model))
        self.z_pos = LearnedPositionalEncoding(
            1 + self._enc_size ** 2, self._d_model, self._dropout)
        self.tfdec = TransformerDecoder(
            num_blocks=ocr.tfdec.num_dec_blocks,
            max_len=self._enc_size ** 2,
            d_model=self._d_model,
            num_heads=ocr.tfdec.num_dec_heads,
            dropout=self._dropout,
        )
        self.out = linear(self._vocab_size, bias=False)

    # -- pieces ---------------------------------------------------------------

    def _tau(self, step):
        ocr = self.ocr_config
        return cosine_anneal(step, ocr.tau_start, ocr.tau_final, 0, ocr.tau_steps)

    def _emb(self, obs):
        """CNN + positional features, flattened to tokens [B, H*W, C]."""
        feat = self.enc_pos(self.enc(obs))
        B, H, W, C = feat.shape
        return feat.reshape(B, H * W, C)

    def get_slots(self, obs):
        """-> (slots [B,N,D], attns [B,HW,N])."""
        return self.slotattn(self._emb(obs))

    def __call__(self, obs):
        if self._use_cnn_feat:
            feat = self.enc_pos(self.enc(obs))
            x = jnp.concatenate([feat, obs], axis=-1)
            return x.reshape(x.shape[0], -1, x.shape[-1])
        slots, _ = self.get_slots(obs)
        return slots

    def forward_with_attns(self, obs, as_masks=False):
        """(slots, attns-as-images [B,N,H,W,1 or C]) for the RL extractor
        (reference: slate_module.py:181-196)."""
        slots, attns = self.get_slots(obs)
        B, HW, N = attns.shape
        H = W = self._obs_size
        attns_img = attns.transpose(0, 2, 1).reshape(B, N, H, W, 1)
        if as_masks:
            return slots, attns_img
        vis = obs[:, None] * attns_img + (1.0 - attns_img)
        return slots, vis

    def _teacher_forced_ce(self, slots, token_ids, train):
        """Cross-entropy of next-token prediction (slate_module.py:140-157).

        Targets arrive as token ids and the CE gathers the target log-prob,
        instead of materializing the [B,T,4096] one-hot the reference
        multiplies against (slate_module.py:151-156) — same value, ~100 MB
        less HBM traffic per step at the benchmark config."""
        B, T = token_ids.shape
        z_emb = self.dictionary(token_ids)
        z_emb = jnp.concatenate(
            [jnp.broadcast_to(self.bos, (B, 1, self._d_model)), z_emb], axis=1)
        z_emb = self.z_pos(z_emb, deterministic=not train)
        decoded = self.tfdec(z_emb[:, :-1], self.slotproj(slots),
                             deterministic=not train)
        pred = self.out(decoded)
        logp = jax.nn.log_softmax(pred, axis=-1)
        # inline one-hot multiply-reduce: XLA fuses the one-hot into the
        # reduction (no [B,T,V] buffer) and the backward stays dense —
        # a take_along_axis gather here costs a scatter in the backward,
        # measurably slower on TPU.
        onehot = jax.nn.one_hot(token_ids, self._vocab_size, dtype=logp.dtype)
        ce = -(onehot * logp).sum(-1)
        return ce.sum(-1).mean()

    def gen_tokens(self, slots):
        """Greedy autoregressive token generation with KV caches (lax.scan)."""
        B = slots.shape[0]
        proj = self.slotproj(slots)
        cross_ks, cross_vs = self.tfdec.cross_kvs(proj)
        k_caches, v_caches = self.tfdec.make_caches(B)
        bos = jnp.broadcast_to(self.bos[0], (B, self._d_model))

        def step(mdl, carry, t):
            emb_t, k_caches, v_caches = carry
            x_t = emb_t + mdl.z_pos.slice_at(t)
            out_t, k_caches, v_caches = mdl.tfdec.step(
                x_t, k_caches, v_caches, t, cross_ks, cross_vs)
            token = jnp.argmax(mdl.out(out_t), axis=-1)  # [B]
            next_emb = mdl.dictionary(token)
            return (next_emb, k_caches, v_caches), token

        T = self._enc_size ** 2
        _, tokens = nn.scan(
            step, variable_broadcast="params", split_rngs={},
        )(self, (bos, k_caches, v_caches), jnp.arange(T))
        return tokens.T  # [B, T]

    def gen_imgs(self, slots):
        """reference: slate_module.py:163-179 (greedy decode -> dVAE decode)."""
        tokens = self.gen_tokens(slots)
        z = jax.nn.one_hot(tokens, self._vocab_size).reshape(
            slots.shape[0], self._enc_size, self._enc_size, self._vocab_size)
        return self.dvae.decode(z)

    def _ari(self, attns, masks):
        """Foreground-masked ARI (reference: slate_module.py:206-216).

        masks: [B,K,H,W,1] with background last."""
        B, HW, N = attns.shape
        H = W = self._obs_size
        attns_img = attns.transpose(0, 2, 1).reshape(B, N, H, W, 1)
        fg = 1.0 - masks[:, -1:]
        pred = jnp.concatenate([attns_img * fg, fg], axis=1)
        return jnp.mean(calculate_ari(masks, pred))

    # -- training surface -------------------------------------------------------

    def _gumbel_argmax_ids(self, z_logits, rng):
        """Hard gumbel sample as token ids: argmax(logits + g) — equivalent to
        the reference's one_hot(argmax(softmax((logits+g)/tau))) since softmax
        and the temperature are monotone per row (slate_module.py:123-128).
        Fused Pallas kernel with on-chip PRNG on TPU (ops/gumbel.py)."""
        from ..ops import gumbel_argmax_ids

        B, H, W, V = z_logits.shape
        return gumbel_argmax_ids(z_logits.reshape(-1, V), rng).reshape(B, -1)

    def loss(self, obs, masks=None, step=0, train=False):
        ocr = self.ocr_config
        tau = self._tau(step)
        z, z_logits = self.dvae(obs, tau, self._hard)
        token_ids = self._gumbel_argmax_ids(z_logits, self.make_rng("noise2"))

        slots, attns = self.get_slots(obs)

        metrics = {}
        if masks is not None:
            metrics["ari"] = self._ari(attns, masks)

        if self._use_bcdec:
            recon = self.bcdec(slots)
            mse = jnp.sum((obs - recon) ** 2) / obs.shape[0]
            loss = mse
            metrics.update({"loss": loss, "mse": mse})
        else:
            recon = self.dvae.decode(z)
            dvae_mse = jnp.sum((obs - recon) ** 2) / obs.shape[0]
            ce = self._teacher_forced_ce(slots, token_ids, train)
            loss = dvae_mse + ce
            metrics.update({"loss": loss, "dvae_mse": dvae_mse,
                            "cross_entropy": ce, "tau": tau})
            lr = ocr.learning
            warm = linear_warmup(step, 0.0, 1.0, 0, lr.lr_warmup_steps)
            decay = jnp.exp2(-jnp.asarray(step, jnp.float32) / lr.lr_half_life)
            metrics.update({"lr_dvae": jnp.asarray(lr.lr_dvae),
                            "lr_enc": decay * warm * lr.lr_enc,
                            "lr_dec": decay * warm * lr.lr_dec})
        return loss, metrics

    def init_all(self, obs):
        """Parameter-creation pass touching every submodule, so checkpoints
        and optimizers cover decoder params in both bcdec and tfdec modes
        without paying for unused compute in the jitted loss."""
        z, z_logits = self.dvae(obs, 1.0, False)
        _ = self.dvae.decode(z)
        slots, _ = self.get_slots(obs)
        token_ids = self._gumbel_argmax_ids(z_logits, self.make_rng("noise2"))
        ce = self._teacher_forced_ce(slots, token_ids, False)
        if self._use_bcdec:
            ce = ce + jnp.sum(self.bcdec(slots))
        return ce

    def sample_arrays(self, obs):
        """Jit-able sample tensors (reference: slate_module.py:243-261);
        grid assembly happens host-side in samples_grid."""
        tau = self._tau(0)
        z, _ = self.dvae(obs, tau, self._hard)
        slots, attns_vis = self.forward_with_attns(obs)
        if self._use_bcdec:
            return obs, self.bcdec(slots), attns_vis
        recon = self.dvae.decode(z)
        recon_tf = self.gen_imgs(slots)
        return obs, recon, recon_tf, attns_vis

    @staticmethod
    def samples_grid(*arrays) -> dict:
        return {"samples": for_viz(visualize(list(arrays)))}


def dims(ocr_config, env_config) -> tuple[int, int]:
    if ocr_config.use_cnn_feat:
        return (ocr_config.cnn.hidden_size + env_config.obs_channels,
                env_config.obs_size ** 2)
    return ocr_config.slotattr.slot_size, ocr_config.slotattr.num_slots


def _group_schedule(base_lr, warmup_steps, half_life):
    def schedule(count):
        warm = linear_warmup(count, 0.0, 1.0, 0, warmup_steps)
        decay = jnp.exp2(-jnp.asarray(count, jnp.float32) / half_life)
        return base_lr * warm * decay
    return schedule


_GROUP_OF = {
    "dvae": "dvae",
    "enc": "sa", "enc_pos": "sa", "slotattn": "sa", "slotproj": "sa", "bcdec": "sa",
    "dictionary": "dec", "bos": "dec", "z_pos": "dec", "tfdec": "dec", "out": "dec",
}


def make_optimizer(ocr_config) -> optax.GradientTransformation:
    """Three Adam groups with warmup x exp-half-life schedules
    (reference: ocrs/slate/slate.py:19-34, 53-67)."""
    lr = ocr_config.learning
    def labels(params):
        return {k: jax.tree.map(lambda _: _GROUP_OF[k], sub)
                for k, sub in params.items()}

    tx = optax.multi_transform(
        {
            "dvae": optax.adam(lr.lr_dvae),
            "sa": optax.adam(_group_schedule(lr.lr_enc, lr.lr_warmup_steps,
                                             lr.lr_half_life)),
            "dec": optax.adam(_group_schedule(lr.lr_dec, lr.lr_warmup_steps,
                                              lr.lr_half_life)),
        },
        param_labels=labels,
    )
    return tx


def build_spec(ocr_config, env_config) -> ModelSpec:
    rep_dim, num_slots = dims(ocr_config, env_config)
    return ModelSpec(
        name="SLATE",
        module=SLATE_Module(ocr_config, env_config),
        rep_dim=rep_dim, num_slots=num_slots,
        optimizer=make_optimizer(ocr_config),
        obs_shape=(env_config.obs_size, env_config.obs_size, env_config.obs_channels),
        clip=ocr_config.learning.clip, clip_ord=float("inf"),
        rng_streams=("noise", "noise2", "dropout"),
        uses_masks=True,
    )
