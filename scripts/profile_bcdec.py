"""Where do the bcdec step's ~64ms go?  Times each component's fwd+bwd
separately on the real chip (contended numbers are still ratio-meaningful)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from ocrl_tpu import config as cfglib
from ocrl_tpu.models import create_ocr

cfg = cfglib.compose("train_ocr", ["ocr=slotattention",
                                   "dataset=random-N5C4S4S2"])
model = create_ocr(cfg.ocr, cfg.dataset, seed=0)
module, params = model.spec.module, model.params
B = 24
obs = jnp.asarray(np.random.rand(B, 64, 64, 3).astype(np.float32))
slots_const = jnp.asarray(np.random.randn(B, 5, 192).astype(np.float32) * 0.1)
rngs = {"noise": jax.random.PRNGKey(0), "noise2": jax.random.PRNGKey(1)}


def timeit(name, fn, *args, n=30):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:28s} {dt * 1e3:7.2f} ms")
    return dt


@jax.jit
def full_loss_grad(params, obs):
    def loss(p):
        l, m = module.apply({"params": p}, obs, None, 0, True,
                            method="loss", rngs=rngs)
        return l
    return jax.grad(loss)(params)


@jax.jit
def slots_grad(params, obs):
    def loss(p):
        s, a = module.apply({"params": p}, obs, method="get_slots", rngs=rngs)
        return jnp.sum(s ** 2)
    return jax.grad(loss)(params)


@jax.jit
def bcdec_grad(params, slots):
    def loss(p):
        r = module.apply({"params": p}, slots,
                         method=lambda m, s: m.bcdec(s), rngs=rngs)
        return jnp.sum(r ** 2)
    return jax.grad(loss)(params)


@jax.jit
def dvae_enc_grad(params, obs):
    def loss(p):
        z, zl = module.apply({"params": p}, obs, 1.0, False,
                             method=lambda m, o, t, h: m.dvae(o, t, h),
                             rngs=rngs)
        return jnp.sum(z ** 2)
    return jax.grad(loss)(params)


print("component fwd+bwd times (batch 24, contended chip):")
timeit("full bcdec loss", full_loss_grad, params, obs)
timeit("get_slots (enc+slotattn)", slots_grad, params, obs)
timeit("bcdec decoder only", bcdec_grad, params, slots_const)
timeit("dvae encoder+gumbel", dvae_enc_grad, params, obs)
