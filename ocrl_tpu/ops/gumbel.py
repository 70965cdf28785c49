"""Pallas TPU kernels: fused Gumbel-softmax sampling with on-chip PRNG.

The dVAE draws two independent Gumbel fields over a [B*h*w, 4096] logit grid
per training step (reference: slate_module.py:123-128 via common/utils.py:75-85)
— at the benchmark config that is 2 x 100 MB of noise that XLA materialises in
HBM.  These kernels generate the noise on-chip (pltpu.prng_random_bits) inside
the same pass that computes the softmax / argmax, so HBM sees only
logits-in / sample-out.

Falls back to pure-jnp implementations off-TPU (CPU tests, interpret-free).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_BLOCK = 128  # rows per grid step; V columns stay whole (softmax is row-wise)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _uniform_from_bits(shape):
    """uint32 random bits -> floats in (0, 1)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # mantissa trick: 0x3F800000 | top-23-bits is uniform on [1, 2)
    mant = (bits >> jnp.uint32(9)) | jnp.uint32(0x3F800000)
    u = pltpu.bitcast(mant, jnp.float32) - jnp.float32(1.0)
    return u + jnp.float32(1e-12)


def _gumbel(shape):
    """-log(Exp(1) + tiny), Exp(1) = -log(U) (reference: utils.py:75-78)."""
    u = _uniform_from_bits(shape)
    tiny = jnp.float32(1.17549435e-38)
    return -jnp.log(-jnp.log(u) + tiny)


# -- soft sample: softmax((logits + g) / tau) ----------------------------------

def _soft_kernel(seed_ref, tau_ref, logits_ref, out_ref):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = logits_ref[:] + _gumbel(logits_ref.shape)
    x = x / tau_ref[0]
    x = x - jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x)
    out_ref[:] = e / jnp.sum(e, axis=-1, keepdims=True)


def _soft_pallas(logits, seed, tau):
    R, V = logits.shape
    grid = pl.cdiv(R, _ROW_BLOCK)
    return pl.pallas_call(
        _soft_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(grid,),
            in_specs=[pl.BlockSpec((_ROW_BLOCK, V), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((_ROW_BLOCK, V), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((R, V), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(jnp.asarray([seed], jnp.int32), jnp.asarray([tau], jnp.float32), logits)


def _soft_reference(logits, rng, tau):
    eps = jnp.finfo(logits.dtype).tiny
    g = -jnp.log(jax.random.exponential(rng, logits.shape, logits.dtype) + eps)
    return jax.nn.softmax((logits + g) / tau, axis=-1)


@jax.custom_vjp
def gumbel_softmax_sample(logits, rng, tau):
    """Soft Gumbel sample y = softmax((logits + g)/tau); differentiable in
    logits, with on-chip noise on TPU."""
    if _on_tpu():
        seed = jax.random.randint(rng, (), 0, 2 ** 31 - 1)
        return _soft_pallas(logits, seed, tau)
    return _soft_reference(logits, rng, tau)


def _soft_fwd(logits, rng, tau):
    y = gumbel_softmax_sample(logits, rng, tau)
    return y, (y, tau)


def _soft_bwd(res, dy):
    y, tau = res
    # d softmax: y * (dy - sum(dy * y)) / tau
    inner = jnp.sum(dy * y, axis=-1, keepdims=True)
    dlogits = y * (dy - inner) / tau
    return (dlogits, None, None)


gumbel_softmax_sample.defvjp(_soft_fwd, _soft_bwd)


# -- hard sample: argmax(logits + g) as token ids --------------------------------

def _ids_kernel(seed_ref, logits_ref, out_ref):
    # decorrelate from the soft-sample stream with an int32-safe odd constant
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0) + jnp.int32(0x5E3779B9))
    x = logits_ref[:] + _gumbel(logits_ref.shape)
    out_ref[:] = jnp.argmax(x, axis=-1, keepdims=True).astype(jnp.int32)


def _ids_pallas(logits, seed):
    R, V = logits.shape
    grid = pl.cdiv(R, _ROW_BLOCK)
    out = pl.pallas_call(
        _ids_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[pl.BlockSpec((_ROW_BLOCK, V), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((_ROW_BLOCK, 1), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((R, 1), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(jnp.asarray([seed], jnp.int32), logits)
    return out[:, 0]


def gumbel_argmax_ids(logits, rng):
    """Hard Gumbel sample as ids: argmax(logits + g).  Non-differentiable
    (the consumer treats it as a constant, like the reference's detached
    z_hard, slate_module.py:127)."""
    logits = jax.lax.stop_gradient(logits)
    if _on_tpu():
        seed = jax.random.randint(rng, (), 0, 2 ** 31 - 1)
        return _ids_pallas(logits, seed)
    eps = jnp.finfo(logits.dtype).tiny
    g = -jnp.log(jax.random.exponential(rng, logits.shape, logits.dtype) + eps)
    return jnp.argmax(logits + g, axis=-1)
