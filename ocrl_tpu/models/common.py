"""Shared NN building blocks (flax, NHWC).

Re-implementations of the reference's common modules with the same math and
initialisation conventions (reference: ocrs/common/{networks,utils,models}.py)
but idiomatic flax: NHWC convs, explicit RNG, pure functions of `step` for
schedules so they can live inside jit.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# -- initialisers matching torch conventions ---------------------------------
# torch xavier_uniform(gain) == variance_scaling(gain^2, fan_avg, uniform)
# torch kaiming_uniform(relu) == variance_scaling(2, fan_in, uniform)
def xavier_uniform(gain: float = 1.0):
    return nn.initializers.variance_scaling(gain * gain, "fan_avg", "uniform")


kaiming_uniform = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")


def linear(features: int, bias: bool = True, weight_init: str = "xavier",
           gain: float = 1.0, name=None) -> nn.Dense:
    """Init-controlled Dense (reference: ocrs/common/networks.py:56-64)."""
    init = kaiming_uniform if weight_init == "kaiming" else xavier_uniform(gain)
    return nn.Dense(features, use_bias=bias, kernel_init=init,
                    bias_init=nn.initializers.zeros, name=name)


def conv2d(features: int, kernel_size: int, stride: int = 1, padding=0,
           bias: bool = True, weight_init: str = "xavier", name=None,
           dtype=None) -> nn.Conv:
    """Init-controlled Conv (reference: ocrs/common/networks.py:6-35); NHWC.

    `dtype` is the COMPUTE dtype (flax semantics): params stay f32 on disk
    and in the optimizer; bf16 here halves the HBM traffic of the conv's
    activations/gradients on TPU (the step is HBM-bound at batch 24)."""
    init = kaiming_uniform if weight_init == "kaiming" else xavier_uniform(1.0)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    return nn.Conv(features, (kernel_size, kernel_size), strides=(stride, stride),
                   padding=padding, use_bias=bias, kernel_init=init,
                   bias_init=nn.initializers.zeros, name=name, dtype=dtype)


class Conv2dBlock(nn.Module):
    """conv (kaiming init) + ReLU (reference: networks.py:38-53)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = conv2d(self.features, self.kernel_size, self.stride, self.padding,
                   weight_init="kaiming", dtype=self.dtype)(x)
        return nn.relu(x)


def pixel_shuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """[B,H,W,C*f*f] -> [B,H*f,W*f,C] (torch PixelShuffle, NHWC).

    torch shuffles NCHW with channel-major blocks; layout here keeps the same
    sub-pixel ordering so decoded images are equivalent up to layout.
    """
    B, H, W, C = x.shape
    f = factor
    c_out = C // (f * f)
    x = x.reshape(B, H, W, c_out, f, f)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B H f W f C
    return x.reshape(B, H * f, W * f, c_out)


class PositionalEmbedding(nn.Module):
    """4-direction linear position ramps -> 1x1 conv -> added to features
    (reference: ocrs/common/utils.py:10-33)."""

    obs_size: int
    channels: int

    @nn.compact
    def __call__(self, x):  # x: [B,H,W,C]
        H = W = self.obs_size
        east = jnp.tile(jnp.linspace(0, 1, W)[None, :], (H, 1))
        west = jnp.tile(jnp.linspace(1, 0, W)[None, :], (H, 1))
        south = jnp.tile(jnp.linspace(0, 1, H)[:, None], (1, W))
        north = jnp.tile(jnp.linspace(1, 0, H)[:, None], (1, W))
        grid = jnp.stack([north, south, west, east], axis=-1)  # [H,W,4]
        proj = conv2d(self.channels, 1, name="channels_map")(grid[None])
        return x + proj


# -- schedules (pure functions of step; jit-safe) ------------------------------

def cosine_anneal(step, start_value, final_value, start_step, final_step):
    """reference: ocrs/common/utils.py:37-49."""
    step = jnp.asarray(step, jnp.float32)
    a = 0.5 * (start_value - final_value)
    b = 0.5 * (start_value + final_value)
    progress = (step - start_step) / max(final_step - start_step, 1)
    mid = a * jnp.cos(math.pi * progress) + b
    return jnp.where(step < start_step, start_value,
                     jnp.where(step >= final_step, final_value, mid))


def linear_warmup(step, start_value, final_value, start_step, final_step):
    """reference: ocrs/common/utils.py:53-65."""
    step = jnp.asarray(step, jnp.float32)
    a = final_value - start_value
    progress = (step + 1 - start_step) / max(final_step - start_step, 1)
    mid = a * progress + start_value
    return jnp.where(step < start_step, start_value,
                     jnp.where(step >= final_step, final_value, mid))


# -- gumbel softmax -------------------------------------------------------------

def gumbel_softmax(rng, logits, tau: float = 1.0, hard: bool = False, axis=-1):
    """Gumbel-softmax with straight-through option
    (reference: ocrs/common/utils.py:75-85)."""
    eps = jnp.finfo(logits.dtype).tiny
    exp_sample = jax.random.exponential(rng, logits.shape, logits.dtype)
    gumbels = -jnp.log(exp_sample + eps)
    y_soft = jax.nn.softmax((logits + gumbels) / tau, axis=axis)
    if not hard:
        return y_soft
    index = jnp.argmax(y_soft, axis=axis)
    y_hard = jax.nn.one_hot(index, logits.shape[axis], axis=axis, dtype=logits.dtype)
    return y_hard - jax.lax.stop_gradient(y_soft) + y_soft


def log_prob_gaussian(value, mean, std):
    """reference: ocrs/common/utils.py:88-95."""
    var = std ** 2
    log_var = math.log(var) if isinstance(var, float) else jnp.log(var)
    return -0.5 * (((value - mean) ** 2) / var + log_var + math.log(2 * math.pi))


# -- misc ------------------------------------------------------------------------

class FusedGRUCell(nn.Module):
    """GRU cell as two fused matmuls (r|z|n gate blocks), torch semantics.

    flax's nn.GRUCell issues six separate small Dense ops; at slot-attention
    shapes ([B*slots, 192]) kernel-launch overhead dominates, so the gates are
    computed from single [D, 3D] input/recurrent kernels instead.  Init
    matches the reference (networks.py:67-74): xavier-uniform input weights,
    orthogonal recurrent weights, zero biases (both torch bias vectors kept).
    """

    features: int

    @nn.compact
    def __call__(self, h, x):
        D = self.features
        wi = self.param("wi", xavier_uniform(), (x.shape[-1], 3 * D))
        wh = self.param("wh", nn.initializers.orthogonal(), (D, 3 * D))
        bi = self.param("bi", nn.initializers.zeros, (3 * D,))
        bh = self.param("bh", nn.initializers.zeros, (3 * D,))
        zi = x @ wi + bi
        zh = h @ wh + bh
        r = jax.nn.sigmoid(zi[..., :D] + zh[..., :D])
        z = jax.nn.sigmoid(zi[..., D:2 * D] + zh[..., D:2 * D])
        n = jnp.tanh(zi[..., 2 * D:] + r * zh[..., 2 * D:])
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new


class MLP(nn.Module):
    """Config-driven MLP with per-layer activations (reference pattern in
    sb3s/custom_acnets.py:36-48, ocrs/gt/gt_module.py:14-21)."""

    dims: Sequence[int]
    acts: Sequence[str]

    @nn.compact
    def __call__(self, x):
        for dim, act in zip(self.dims, self.acts):
            x = nn.Dense(dim)(x)
            if act == "relu":
                x = nn.relu(x)
            elif act == "tanh":
                x = nn.tanh(x)
            elif act in ("none", "linear", None):
                pass
            else:
                raise ValueError(f"activation '{act}' is not implemented")
        return x
