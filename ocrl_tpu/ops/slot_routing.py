"""Chunked slot-attention routing sweep (Pallas TPU, fwd + manual VJP).

The slot-attention routing loop (reference: ocrs/common/slot_attn.py:64-101)
touches two large tensors per iteration — k and v, [B, N, D] with N=4096 at
real SLATE shapes (the FULL 64x64 CNN feature map, not the 16x16 dVAE grid) —
while every other operand is slot-sized ([S=5, D=192]).  Round 2 shipped a
whole-loop kernel that kept k/v and all intermediates VMEM-resident; at real
shapes that needs 20.05 MB > the 16 MB scoped VMEM budget (measured on v5e),
so it shipped default-off.  This is the chunked redesign VERDICT round-2
item 4 asked for, at a deliberately different altitude:

- Pallas owns ONLY the token-dimension sweep: for each N-chunk streamed from
  HBM it computes the slot softmax and accumulates the three reductions the
  iteration needs — ``S_a = sum_n a_n`` ([B, S]), ``A_v = a^T v``
  ([B, S, D]) — and writes the attention map ``a`` ([B, N, S], needed for
  attn_vis and reused by the backward sweep).  VMEM per program is two
  [chunk, D] tiles plus slot-sized operands (~1 MB at chunk=512), independent
  of N.
- Everything slot-sized (the inverted-softmax renormalisation via
  ``upd = (A_v + eps * sum_n v) / (S_a + N * eps)``, the GRU, the residual
  MLP, layernorms, the T-iteration loop) stays plain flax/jnp in
  models/slot_attention.py — XLA already fuses [B, S, D] elementwise chains;
  hand-scheduling them in a kernel bought nothing but the VMEM blow-up.
- The custom VJP is ONE chunk sweep (not two): the only cross-chunk
  dependency in the backward — the 1/s^2 renormalisation term — lives in the
  jnp part, so the kernel's cotangents (g_S_a, g_A_v, g_a) arrive fully
  formed and each chunk's gk/gv/gq contribution is local.

The softmax here is per-token over slots (the "competition among slots"
direction, slot_attn.py:75-87): no cross-chunk max/sum carry is needed, which
is what makes the single-pass accumulate exact, not an online-softmax
approximation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def pick_chunk(n: int, target: int = 512) -> int:
    """Largest power-of-two chunk <= target that divides n (0 = no fit)."""
    c = target
    while c >= 8:
        if n % c == 0:
            return c
        c //= 2
    return 0


def _softmax_rows(logits):
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


# -- forward sweep -----------------------------------------------------------


def _sweep_fwd_kernel(k_ref, v_ref, q_ref, sa_ref, av_ref, a_ref):
    k, v, q = k_ref[0], v_ref[0], q_ref[0]          # [C,D], [C,D], [S,D]
    a = _softmax_rows(_dot(k, q, ((1,), (1,))))      # [C,S] softmax over slots

    @pl.when(pl.program_id(1) == 0)
    def _():
        sa_ref[:] = jnp.zeros_like(sa_ref)
        av_ref[:] = jnp.zeros_like(av_ref)

    a_ref[0] = a
    sa_ref[0] += jnp.sum(a, axis=0)                  # [S]
    av_ref[0] += _dot(a, v, ((0,), (0,)))            # [S,D]


def _sweep_bwd_kernel(k_ref, v_ref, a_ref, q_ref, gsa_ref, gav_ref, ga_ref,
                      gk_ref, gv_ref, gq_ref):
    k, v, a = k_ref[0], v_ref[0], a_ref[0]
    q, g_sa, g_av, g_a = q_ref[0], gsa_ref[0], gav_ref[0], ga_ref[0]
    # da_ns = g_sa_s + (v g_av^T)_ns + g_a_ns
    da = g_sa[None, :] + _dot(v, g_av, ((1,), (1,))) + g_a       # [C,S]
    dlogits = a * (da - jnp.sum(da * a, axis=-1, keepdims=True))  # [C,S]
    gk_ref[0] = _dot(dlogits, q, ((1,), (0,)))                    # [C,D]
    gv_ref[0] = _dot(a, g_av, ((1,), (0,)))                       # [C,D]

    @pl.when(pl.program_id(1) == 0)
    def _():
        gq_ref[:] = jnp.zeros_like(gq_ref)

    gq_ref[0] += _dot(dlogits, k, ((0,), (0,)))                   # [S,D]


def _chunk_spec(C, X):
    return pl.BlockSpec((1, C, X), lambda b, c: (b, c, 0))


def _perb_spec(shape):
    return pl.BlockSpec((1,) + shape,
                        lambda b, c: (b,) + (0,) * len(shape))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def route_sweep(chunk, k, v, q):
    """One token sweep of slot-attention routing.

    k: [B, N, D] (pre-scaled by D**-0.5), v: [B, N, D], q: [B, S, D].
    Returns (S_a [B, S], A_v [B, S, D], a [B, N, S]) where
    a = softmax_slots(k q^T), S_a = sum_n a, A_v = a^T v.
    """
    return _route_sweep_fwd(chunk, k, v, q)[0]


def _route_sweep_fwd(chunk, k, v, q):
    B, N, D = k.shape
    S = q.shape[1]
    NC = N // chunk
    sa, av, a = pl.pallas_call(
        _sweep_fwd_kernel,
        grid=(B, NC),
        in_specs=[_chunk_spec(chunk, D), _chunk_spec(chunk, D),
                  _perb_spec((S, D))],
        out_specs=[_perb_spec((S,)), _perb_spec((S, D)),
                   _chunk_spec(chunk, S)],
        out_shape=[jax.ShapeDtypeStruct((B, S), jnp.float32),
                   jax.ShapeDtypeStruct((B, S, D), jnp.float32),
                   jax.ShapeDtypeStruct((B, N, S), jnp.float32)],
        interpret=_interpret(),
    )(k, v, q)
    return (sa, av, a), (k, v, q, a)


def _route_sweep_bwd(chunk, saved, cts):
    k, v, q, a = saved
    g_sa, g_av, g_a = cts
    B, N, D = k.shape
    S = q.shape[1]
    NC = N // chunk
    gk, gv, gq = pl.pallas_call(
        _sweep_bwd_kernel,
        grid=(B, NC),
        in_specs=[_chunk_spec(chunk, D), _chunk_spec(chunk, D),
                  _chunk_spec(chunk, S), _perb_spec((S, D)),
                  _perb_spec((S,)), _perb_spec((S, D)),
                  _chunk_spec(chunk, S)],
        out_specs=[_chunk_spec(chunk, D), _chunk_spec(chunk, D),
                   _perb_spec((S, D))],
        out_shape=[jax.ShapeDtypeStruct((B, N, D), jnp.float32),
                   jax.ShapeDtypeStruct((B, N, D), jnp.float32),
                   jax.ShapeDtypeStruct((B, S, D), jnp.float32)],
        interpret=_interpret(),
    )(k, v, a, q, g_sa, g_av, g_a)
    return gk, gv, gq


route_sweep.defvjp(_route_sweep_fwd, _route_sweep_bwd)


def route_sweep_reference(k, v, q):
    """Pure-jnp sweep (numerical reference for the kernel)."""
    a = jax.nn.softmax(jnp.einsum("bnd,bsd->bns", k, q), axis=-1)
    return a.sum(axis=1), jnp.einsum("bns,bnd->bsd", a, v), a
