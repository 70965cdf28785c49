"""SLATE-style transformer encoder/decoder (reference: ocrs/common/transformer.py).

Same math (pre-LN blocks with depth-scaled output gains, "is_first" variant,
causal self-attention + cross-attention to slots) with a TPU-native addition:
a KV-cached single-token `step` path used by the autoregressive image
generator under `lax.scan`, instead of re-running full attention over the
whole prefix for each of the 256 tokens (reference: slate_module.py:163-179).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import linear, xavier_uniform


class MultiHeadAttention(nn.Module):
    """reference: transformer.py:7-50."""

    d_model: int
    num_heads: int
    dropout: float = 0.0
    gain: float = 1.0

    def setup(self):
        assert self.d_model % self.num_heads == 0
        self.proj_q = linear(self.d_model, bias=False)
        self.proj_k = linear(self.d_model, bias=False)
        self.proj_v = linear(self.d_model, bias=False)
        self.proj_o = linear(self.d_model, bias=False, gain=self.gain)
        self.attn_dropout = nn.Dropout(self.dropout)
        self.output_dropout = nn.Dropout(self.dropout)

    def _split(self, x):
        B, T, _ = x.shape
        return x.reshape(B, T, self.num_heads, -1).transpose(0, 2, 1, 3)

    def __call__(self, q, k, v, attn_mask=None, deterministic=True):
        B, T, _ = q.shape
        q = self._split(self.proj_q(q)) * (self.d_model // self.num_heads) ** -0.5
        k = self._split(self.proj_k(k))
        v = self._split(self.proj_v(v))
        attn = jnp.einsum("bhtd,bhsd->bhts", q, k)
        if attn_mask is not None:
            attn = jnp.where(attn_mask, -jnp.inf, attn)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = self.attn_dropout(attn, deterministic=deterministic)
        out = jnp.einsum("bhts,bhsd->bhtd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, -1)
        return self.output_dropout(self.proj_o(out), deterministic=deterministic)

    # -- single-token cached attention (decode path) -------------------------

    def kv(self, x):
        """Precompute K/V for a fixed source (cross-attention to slots)."""
        return self._split(self.proj_k(x)), self._split(self.proj_v(x))

    def step_with_kv(self, q_t, k, v):
        """One query token against precomputed K/V. q_t: [B, d]."""
        B, _ = q_t.shape
        q = self.proj_q(q_t).reshape(B, self.num_heads, 1, -1)
        q = q * (self.d_model // self.num_heads) ** -0.5
        attn = jax.nn.softmax(jnp.einsum("bhtd,bhsd->bhts", q, k), axis=-1)
        out = jnp.einsum("bhts,bhsd->bhtd", attn, v)
        return self.proj_o(out.transpose(0, 2, 1, 3).reshape(B, -1))

    def step_cached(self, q_t, k_cache, v_cache, t):
        """Causal self-attention for token t with K/V caches [B,H,T_max,hd].

        Returns (out [B,d], new_k_cache, new_v_cache)."""
        B, _ = q_t.shape
        hd = self.d_model // self.num_heads
        k_t = self.proj_k(q_t).reshape(B, self.num_heads, 1, hd)
        v_t = self.proj_v(q_t).reshape(B, self.num_heads, 1, hd)
        k_cache = jax.lax.dynamic_update_slice(k_cache, k_t, (0, 0, t, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, v_t, (0, 0, t, 0))
        q = self.proj_q(q_t).reshape(B, self.num_heads, 1, hd) * hd ** -0.5
        attn = jnp.einsum("bhtd,bhsd->bhts", q, k_cache)
        T_max = k_cache.shape[2]
        mask = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, T_max), 3) > t
        attn = jnp.where(mask, -jnp.inf, attn)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhts,bhsd->bhtd", attn, v_cache)
        out = self.proj_o(out.transpose(0, 2, 1, 3).reshape(B, -1))
        return out, k_cache, v_cache


class FFN(nn.Module):
    d_model: int
    gain: float
    dropout: float

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = linear(4 * self.d_model, weight_init="kaiming")(x)
        x = nn.relu(x)
        x = linear(self.d_model, gain=self.gain)(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class TransformerEncoderBlock(nn.Module):
    """reference: transformer.py:69-102."""

    d_model: int
    num_heads: int
    dropout: float = 0.0
    gain: float = 1.0
    is_first: bool = False

    def setup(self):
        self.attn_layer_norm = nn.LayerNorm()
        self.attn = MultiHeadAttention(self.d_model, self.num_heads, self.dropout, self.gain)
        self.ffn_layer_norm = nn.LayerNorm()
        self.ffn = FFN(self.d_model, self.gain, self.dropout)

    def __call__(self, x, deterministic=True):
        if self.is_first:
            x = self.attn_layer_norm(x)
            x = x + self.attn(x, x, x, deterministic=deterministic)
        else:
            normed = self.attn_layer_norm(x)
            x = x + self.attn(normed, normed, normed, deterministic=deterministic)
        y = self.ffn(self.ffn_layer_norm(x), deterministic=deterministic)
        return x + y


class TransformerEncoder(nn.Module):
    """reference: transformer.py:105-137."""

    num_blocks: int
    d_model: int
    num_heads: int
    dropout: float = 0.0

    def setup(self):
        gain = (2 * self.num_blocks) ** -0.5 if self.num_blocks > 0 else 1.0
        self.blocks = [
            TransformerEncoderBlock(self.d_model, self.num_heads, self.dropout,
                                    gain, is_first=(i == 0))
            for i in range(self.num_blocks)
        ]
        self.layer_norm = nn.LayerNorm()

    def __call__(self, x, deterministic=True):
        for block in self.blocks:
            x = block(x, deterministic=deterministic)
        return self.layer_norm(x)


class TransformerDecoderBlock(nn.Module):
    """reference: transformer.py:140-190."""

    d_model: int
    num_heads: int
    dropout: float = 0.0
    gain: float = 1.0
    is_first: bool = False

    def setup(self):
        self.self_attn_layer_norm = nn.LayerNorm()
        self.self_attn = MultiHeadAttention(self.d_model, self.num_heads,
                                            self.dropout, self.gain)
        self.encoder_decoder_attn_layer_norm = nn.LayerNorm()
        self.encoder_decoder_attn = MultiHeadAttention(self.d_model, self.num_heads,
                                                       self.dropout, self.gain)
        self.ffn_layer_norm = nn.LayerNorm()
        self.ffn = FFN(self.d_model, self.gain, self.dropout)

    def __call__(self, x, encoder_output, deterministic=True):
        T = x.shape[1]
        causal = jnp.triu(jnp.ones((T, T), bool), k=1)
        if self.is_first:
            x = self.self_attn_layer_norm(x)
            x = x + self.self_attn(x, x, x, causal, deterministic=deterministic)
        else:
            normed = self.self_attn_layer_norm(x)
            x = x + self.self_attn(normed, normed, normed, causal,
                                   deterministic=deterministic)
        normed = self.encoder_decoder_attn_layer_norm(x)
        x = x + self.encoder_decoder_attn(normed, encoder_output, encoder_output,
                                          deterministic=deterministic)
        y = self.ffn(self.ffn_layer_norm(x), deterministic=deterministic)
        return x + y

    # -- decode path ----------------------------------------------------------

    def cross_kv(self, encoder_output):
        return self.encoder_decoder_attn.kv(encoder_output)

    def step(self, x_t, k_cache, v_cache, t, cross_k, cross_v):
        """One decode token. x_t: [B, d]."""
        if self.is_first:
            x_t = self.self_attn_layer_norm(x_t)
            out, k_cache, v_cache = self.self_attn.step_cached(x_t, k_cache, v_cache, t)
            x_t = x_t + out
        else:
            normed = self.self_attn_layer_norm(x_t)
            out, k_cache, v_cache = self.self_attn.step_cached(normed, k_cache, v_cache, t)
            x_t = x_t + out
        normed = self.encoder_decoder_attn_layer_norm(x_t)
        x_t = x_t + self.encoder_decoder_attn.step_with_kv(normed, cross_k, cross_v)
        x_t = x_t + self.ffn(self.ffn_layer_norm(x_t))
        return x_t, k_cache, v_cache


class TransformerDecoder(nn.Module):
    """reference: transformer.py:193-226 (+ cached decode)."""

    num_blocks: int
    max_len: int
    d_model: int
    num_heads: int
    dropout: float = 0.0

    def setup(self):
        gain = (3 * self.num_blocks) ** -0.5 if self.num_blocks > 0 else 1.0
        self.blocks = [
            TransformerDecoderBlock(self.d_model, self.num_heads, self.dropout,
                                    gain, is_first=(i == 0))
            for i in range(self.num_blocks)
        ]
        self.layer_norm = nn.LayerNorm()

    def __call__(self, x, encoder_output, deterministic=True):
        for block in self.blocks:
            x = block(x, encoder_output, deterministic=deterministic)
        return self.layer_norm(x)

    def make_caches(self, batch: int, dtype=jnp.float32):
        hd = self.d_model // self.num_heads
        shape = (len(self.blocks), batch, self.num_heads, self.max_len, hd)
        return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)

    def cross_kvs(self, encoder_output):
        ks, vs = zip(*(b.cross_kv(encoder_output) for b in self.blocks))
        return jnp.stack(ks), jnp.stack(vs)

    def step(self, x_t, k_caches, v_caches, t, cross_ks, cross_vs):
        """One token through all blocks. x_t: [B, d]."""
        new_k, new_v = [], []
        for i, block in enumerate(self.blocks):
            x_t, k_i, v_i = block.step(x_t, k_caches[i], v_caches[i], t,
                                       cross_ks[i], cross_vs[i])
            new_k.append(k_i)
            new_v.append(v_i)
        return self.layer_norm(x_t), jnp.stack(new_k), jnp.stack(new_v)


class LearnedPositionalEncoding(nn.Module):
    """reference: transformer.py:53-66 (batch-first here)."""

    max_len: int
    d_model: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic=True):
        pe = self.param("pe", nn.initializers.truncated_normal(1.0, lower=-2.0, upper=2.0),
                        (1, self.max_len, self.d_model))
        x = x + pe[:, : x.shape[1]]
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)

    def slice_at(self, t):
        """pe[t] for the cached decode path: [1, d]."""
        pe = self.get_variable("params", "pe")
        return jax.lax.dynamic_slice(pe[0], (t, 0), (1, pe.shape[-1]))
