"""Fused slot-attention routing kernel (Pallas TPU, fwd + manual bwd).

The slot-attention iteration loop (reference: ocrs/common/slot_attn.py:64-101)
is tiny in FLOPs (~100 MFLOP/iteration at SLATE shapes) but long in op count:
layernorms, a q projection, the inverted softmax, the input renormalisation,
a GRU and a residual MLP — dozens of small XLA ops per iteration over
sub-MXU-tile shapes ([S=5, D=192]).  This kernel runs the ENTIRE
``num_iterations`` loop for one batch element as ONE Pallas program (grid over
batch), keeping every intermediate in VMEM, with a hand-derived backward
kernel that recomputes the per-iteration forward from checkpointed slot
states (3 x [S, D] per example — nothing else is saved).

Single-head only (every reference config uses num_slot_heads=1,
configs/ocr/slate.yaml); the jnp path in models/slot_attention.py remains the
generic fallback and the numerical reference (`slot_routing_reference`).

Weight-gradient accumulation across the batch grid uses the sequential-grid
reduction pattern: all programs map to the same output block, program 0
zeroes it, later programs add into it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-6  # flax nn.LayerNorm default, matches the jnp path

# parameter ordering (flat tuple mirrors this everywhere)
PKEYS = ("ns_scale", "ns_bias", "wq", "wi", "wh", "bi", "bh",
         "nm_scale", "nm_bias", "w1", "b1", "w2", "b2")


def _row(p):
    """Biases/norm params as (1, X) rows — TPU wants >=2D operands."""
    return p.reshape(1, -1)


def _ln_fwd(x, scale, bias):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    xhat = (x - mu) * rstd
    return xhat * scale + bias, xhat, rstd


def _ln_bwd(dy, xhat, rstd, scale):
    dxhat = dy * scale
    dx = rstd * (dxhat - jnp.mean(dxhat, axis=-1, keepdims=True)
                 - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
    return dx, jnp.sum(dy * xhat, axis=0, keepdims=True), \
        jnp.sum(dy, axis=0, keepdims=True)


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _iter_fwd(slots, k, v, w, eps):
    """One routing iteration; returns (new_slots, attn_vis, residuals)."""
    D = slots.shape[-1]
    normed, ns_xhat, ns_rstd = _ln_fwd(slots, w["ns_scale"], w["ns_bias"])
    q = _dot(normed, w["wq"], ((1,), (0,)))                   # [S, D]
    logits = _dot(k, q, ((1,), (1,)))                          # [N, S]
    a = jax.nn.softmax(logits, axis=-1)                        # over slots
    ae = a + eps
    s = jnp.sum(ae, axis=0, keepdims=True)                     # [1, S]
    a2 = ae / s
    upd = _dot(a2, v, ((0,), (0,)))                            # [S, D]
    zi = _dot(upd, w["wi"], ((1,), (0,))) + w["bi"]            # [S, 3D]
    zh = _dot(slots, w["wh"], ((1,), (0,))) + w["bh"]
    r = jax.nn.sigmoid(zi[:, :D] + zh[:, :D])
    z = jax.nn.sigmoid(zi[:, D:2 * D] + zh[:, D:2 * D])
    n = jnp.tanh(zi[:, 2 * D:] + r * zh[:, 2 * D:])
    h = (1.0 - z) * n + z * slots
    nm, nm_xhat, nm_rstd = _ln_fwd(h, w["nm_scale"], w["nm_bias"])
    y1 = _dot(nm, w["w1"], ((1,), (0,))) + w["b1"]
    a1 = jnp.maximum(y1, 0.0)
    out = h + _dot(a1, w["w2"], ((1,), (0,))) + w["b2"]
    res = dict(normed=normed, ns_xhat=ns_xhat, ns_rstd=ns_rstd, q=q, a=a,
               ae=ae, s=s, a2=a2, upd=upd, zh=zh, r=r, z=z, n=n, h=h, nm=nm,
               nm_xhat=nm_xhat, nm_rstd=nm_rstd, y1=y1, a1=a1)
    return out, a, res


def _iter_bwd(slots, k, v, w, eps, g_out, g_attn):
    """Backward of one iteration (forward recomputed from `slots`).

    Returns (g_slots_prev, g_k, g_v, {weight grads})."""
    D = slots.shape[-1]
    _, _, res = _iter_fwd(slots, k, v, w, eps)
    gw = {}
    # residual MLP
    da1 = _dot(g_out, w["w2"], ((1,), (1,)))
    gw["w2"] = _dot(res["a1"], g_out, ((0,), (0,)))
    gw["b2"] = jnp.sum(g_out, axis=0, keepdims=True)
    dy1 = da1 * (res["y1"] > 0.0)
    dnm = _dot(dy1, w["w1"], ((1,), (1,)))
    gw["w1"] = _dot(res["nm"], dy1, ((0,), (0,)))
    gw["b1"] = jnp.sum(dy1, axis=0, keepdims=True)
    dh_ln, gw["nm_scale"], gw["nm_bias"] = _ln_bwd(
        dnm, res["nm_xhat"], res["nm_rstd"], w["nm_scale"])
    dh = g_out + dh_ln
    # GRU
    r, z, n, zh = res["r"], res["z"], res["n"], res["zh"]
    dz = dh * (slots - n)
    dn = dh * (1.0 - z)
    g_prev = dh * z
    dn_pre = dn * (1.0 - n * n)
    dr = dn_pre * zh[:, 2 * D:]
    dzh_n = dn_pre * r
    dr_pre = dr * r * (1.0 - r)
    dz_pre = dz * z * (1.0 - z)
    dzi = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=-1)
    dzh = jnp.concatenate([dr_pre, dz_pre, dzh_n], axis=-1)
    dupd = _dot(dzi, w["wi"], ((1,), (1,)))
    gw["wi"] = _dot(res["upd"], dzi, ((0,), (0,)))
    gw["bi"] = jnp.sum(dzi, axis=0, keepdims=True)
    g_prev = g_prev + _dot(dzh, w["wh"], ((1,), (1,)))
    gw["wh"] = _dot(slots, dzh, ((0,), (0,)))
    gw["bh"] = jnp.sum(dzh, axis=0, keepdims=True)
    # weighted mean over inputs
    da2 = _dot(v, dupd, ((1,), (1,)))                          # [N, S]
    g_v = _dot(res["a2"], dupd, ((1,), (0,)))                  # [N, D]
    ds = -jnp.sum(da2 * res["ae"], axis=0, keepdims=True) / (res["s"] * res["s"])
    da = da2 / res["s"] + ds
    da = da + g_attn                                            # attn_vis tap
    # softmax over slots
    a = res["a"]
    dlogits = a * (da - jnp.sum(da * a, axis=-1, keepdims=True))
    g_k = _dot(dlogits, res["q"], ((1,), (0,)))                # [N, D]
    dq = _dot(dlogits, k, ((0,), (0,)))                        # [S, D]
    dnormed = _dot(dq, w["wq"], ((1,), (1,)))
    gw["wq"] = _dot(res["normed"], dq, ((0,), (0,)))
    dslots_ln, gw["ns_scale"], gw["ns_bias"] = _ln_bwd(
        dnormed, res["ns_xhat"], res["ns_rstd"], w["ns_scale"])
    g_prev = g_prev + dslots_ln
    return g_prev, g_k, g_v, gw


# -- Pallas kernels ----------------------------------------------------------


def _fwd_kernel(T, eps, k_ref, v_ref, s0_ref, *rest):
    w_refs, outs = rest[:len(PKEYS)], rest[len(PKEYS):]
    slots_ref, attn_ref, res_ref = outs
    w = {key: ref[:] for key, ref in zip(PKEYS, w_refs)}
    k, v = k_ref[0], v_ref[0]
    slots = s0_ref[0]
    attn = None
    for t in range(T):
        res_ref[0, t] = slots
        slots, attn, _ = _iter_fwd(slots, k, v, w, eps)
    slots_ref[0] = slots
    attn_ref[0] = attn


def _bwd_kernel(T, eps, k_ref, v_ref, res_ref, g_s_ref, g_a_ref, *rest):
    w_refs = rest[:len(PKEYS)]
    gk_ref, gv_ref, gs0_ref = rest[len(PKEYS):len(PKEYS) + 3]
    gw_refs = rest[len(PKEYS) + 3:]
    w = {key: ref[:] for key, ref in zip(PKEYS, w_refs)}
    k, v = k_ref[0], v_ref[0]

    @pl.when(pl.program_id(0) == 0)
    def _():
        for ref in gw_refs:
            ref[:] = jnp.zeros_like(ref)

    g = g_s_ref[0]
    gk = jnp.zeros_like(k)
    gv = jnp.zeros_like(v)
    zero_attn = jnp.zeros_like(g_a_ref[0])
    gws = None
    for t in reversed(range(T)):
        g_attn = g_a_ref[0] if t == T - 1 else zero_attn
        g, gk_t, gv_t, gw_t = _iter_bwd(res_ref[0, t], k, v, w, eps, g, g_attn)
        gk = gk + gk_t
        gv = gv + gv_t
        gws = gw_t if gws is None else {key: gws[key] + gw_t[key] for key in gw_t}
    gk_ref[0] = gk
    gv_ref[0] = gv
    gs0_ref[0] = g
    for key, ref in zip(PKEYS, gw_refs):
        ref[:] += gws[key]


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _batch_spec(shape):
    return pl.BlockSpec((1,) + shape, lambda b: (b,) + (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _wvals(params):
    return tuple(_row(params[key]) if params[key].ndim == 1 else params[key]
                 for key in PKEYS)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def slot_routing(T, eps, k, v, slots0, params):
    """Fused slot-attention routing: T iterations, single head.

    k: [B, N, D] (already scaled by D**-0.5), v: [B, N, D],
    slots0: [B, S, D], params: dict with PKEYS (1-D biases/norm params).
    Returns (slots [B, S, D], attn_vis [B, N, S])."""
    out, _ = _routing_fwd_impl(T, eps, k, v, slots0, params)
    return out


def _routing_fwd_impl(T, eps, k, v, slots0, params):
    B, N, D = k.shape
    S = slots0.shape[1]
    wvals = _wvals(params)
    slots, attn, res = pl.pallas_call(
        functools.partial(_fwd_kernel, T, eps),
        grid=(B,),
        in_specs=[_batch_spec((N, D)), _batch_spec((N, D)), _batch_spec((S, D))]
        + [_const_spec(wv.shape) for wv in wvals],
        out_specs=[_batch_spec((S, D)), _batch_spec((N, S)),
                   _batch_spec((T, S, D))],
        out_shape=[jax.ShapeDtypeStruct((B, S, D), jnp.float32),
                   jax.ShapeDtypeStruct((B, N, S), jnp.float32),
                   jax.ShapeDtypeStruct((B, T, S, D), jnp.float32)],
        interpret=_interpret(),
    )(k, v, slots0, *wvals)
    return (slots, attn), res


def _routing_fwd(T, eps, k, v, slots0, params):
    out, res = _routing_fwd_impl(T, eps, k, v, slots0, params)
    return out, (k, v, res, params)


def _routing_bwd(T, eps, saved, cts):
    k, v, res, params = saved
    g_slots, g_attn = cts
    B, N, D = k.shape
    S = g_slots.shape[1]
    wvals = _wvals(params)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, T, eps),
        grid=(B,),
        in_specs=[_batch_spec((N, D)), _batch_spec((N, D)),
                  _batch_spec((T, S, D)), _batch_spec((S, D)),
                  _batch_spec((N, S))]
        + [_const_spec(wv.shape) for wv in wvals],
        out_specs=[_batch_spec((N, D)), _batch_spec((N, D)),
                   _batch_spec((S, D))]
        + [_const_spec(wv.shape) for wv in wvals],
        out_shape=[jax.ShapeDtypeStruct((B, N, D), jnp.float32),
                   jax.ShapeDtypeStruct((B, N, D), jnp.float32),
                   jax.ShapeDtypeStruct((B, S, D), jnp.float32)]
        + [jax.ShapeDtypeStruct(wv.shape, jnp.float32) for wv in wvals],
        interpret=_interpret(),
    )(k, v, res, g_slots, g_attn, *wvals)
    gk, gv, gs0 = outs[:3]
    gw = {key: g.reshape(params[key].shape)
          for key, g in zip(PKEYS, outs[3:])}
    return gk, gv, gs0, gw


slot_routing.defvjp(_routing_fwd, _routing_bwd)


def slot_routing_reference(T, eps, k, v, slots0, params):
    """Pure-jnp single-head reference (mirrors models/slot_attention.py)."""
    w = {key: (_row(params[key]) if params[key].ndim == 1 else params[key])
         for key in PKEYS}

    def one(k1, v1, s1):
        slots, attn = s1, None
        for _ in range(T):
            slots, attn, _ = _iter_fwd(slots, k1, v1, w, eps)
        return slots, attn

    return jax.vmap(one)(k, v, slots0)
