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
  HBM it computes the slot softmax, writes the attention map ``a``
  ([B, N, S], needed for attn_vis and reused by the backward sweep), and a
  per-chunk partial reduction ``a^T v`` ([B, NC, S, D]).  VMEM per program is
  two [chunk, D] tiles plus slot-sized operands (~1 MB at chunk=512),
  independent of N.
- Cross-chunk reductions happen in jnp (`partial.sum(1)`, `a.sum(1)`): the
  partials are slot-sized so the extra HBM traffic is negligible, and the
  kernel needs NO grid-position-dependent accumulation — which keeps it
  vmap-safe (jax.vmap prepends a grid axis to pallas_call, so program_id-
  based revisit-accumulation patterns silently break under vmap; learned on
  real hardware, round 3).
- Everything slot-sized (the inverted-softmax renormalisation via
  ``upd = (A_v + eps * sum_n v) / (S_a + N * eps)``, the GRU, the residual
  MLP, layernorms, the T-iteration loop) stays plain flax/jnp in
  models/slot_attention.py — XLA already fuses slot-sized elementwise
  chains; hand-scheduling them in a kernel bought nothing but the VMEM
  blow-up.
- The custom VJP is ONE chunk sweep (not two): the only cross-chunk
  dependency in the backward — the 1/s^2 renormalisation term — lives in the
  jnp part, so the kernel's cotangents arrive fully formed (g_sa folded into
  g_a before the call) and each chunk's gk/gv/gq contribution is local.

The softmax here is per-token over slots (the "competition among slots"
direction, slot_attn.py:75-87): no cross-chunk max/sum carry is needed, which
is what makes the single-pass chunking exact, not an online-softmax
approximation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


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


# -- kernels (one (b, chunk) program each; every output block written
# exactly once — no cross-program accumulation, see module docstring) --------


def _sweep_fwd_kernel(k_ref, v_ref, q_ref, a_ref, avp_ref):
    k, v, q = k_ref[0], v_ref[0], q_ref[0]          # [C,D], [C,D], [S,D]
    a = _softmax_rows(_dot(k, q, ((1,), (1,))))      # [C,S] softmax over slots
    a_ref[0] = a
    avp_ref[0, 0] = _dot(a, v, ((0,), (0,)))         # [S,D] chunk partial


def _sweep_bwd_kernel(k_ref, v_ref, a_ref, q_ref, gav_ref, ga_ref,
                      gk_ref, gv_ref, gqp_ref):
    k, v, a = k_ref[0], v_ref[0], a_ref[0]
    q, g_av, g_a = q_ref[0], gav_ref[0], ga_ref[0]
    # da_ns = (v g_av^T)_ns + g_a_ns   (the g_sa term is folded into g_a)
    da = _dot(v, g_av, ((1,), (1,))) + g_a                        # [C,S]
    dlogits = a * (da - jnp.sum(da * a, axis=-1, keepdims=True))  # [C,S]
    gk_ref[0] = _dot(dlogits, q, ((1,), (0,)))                    # [C,D]
    gv_ref[0] = _dot(a, g_av, ((1,), (0,)))                       # [C,D]
    gqp_ref[0, 0] = _dot(dlogits, k, ((0,), (0,)))                # [S,D]


def _chunk_spec(C, X):
    return pl.BlockSpec((1, C, X), lambda b, c: (b, c, 0))


def _perb_spec(shape):
    return pl.BlockSpec((1,) + shape,
                        lambda b, c: (b,) + (0,) * len(shape))


def _partial_spec(shape):
    return pl.BlockSpec((1, 1) + shape,
                        lambda b, c: (b, c) + (0,) * len(shape))


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
    a, av_partial = pl.pallas_call(
        _sweep_fwd_kernel,
        grid=(B, NC),
        in_specs=[_chunk_spec(chunk, D), _chunk_spec(chunk, D),
                  _perb_spec((S, D))],
        out_specs=[_chunk_spec(chunk, S), _partial_spec((S, D))],
        out_shape=[jax.ShapeDtypeStruct((B, N, S), jnp.float32),
                   jax.ShapeDtypeStruct((B, NC, S, D), jnp.float32)],
        interpret=_interpret(),
    )(k, v, q)
    sa = a.sum(axis=1)                    # [B, S] — slot-sized jnp reduction
    av = av_partial.sum(axis=1)           # [B, S, D]
    return (sa, av, a), (k, v, q, a)


def _route_sweep_bwd(chunk, saved, cts):
    k, v, q, a = saved
    g_sa, g_av, g_a = cts
    B, N, D = k.shape
    S = q.shape[1]
    NC = N // chunk
    # fold the S_a cotangent into a's (S_a = sum_n a is linear)
    g_a2 = g_a + g_sa[:, None, :]
    gk, gv, gq_partial = pl.pallas_call(
        _sweep_bwd_kernel,
        grid=(B, NC),
        in_specs=[_chunk_spec(chunk, D), _chunk_spec(chunk, D),
                  _chunk_spec(chunk, S), _perb_spec((S, D)),
                  _perb_spec((S, D)), _chunk_spec(chunk, S)],
        out_specs=[_chunk_spec(chunk, D), _chunk_spec(chunk, D),
                   _partial_spec((S, D))],
        out_shape=[jax.ShapeDtypeStruct((B, N, D), jnp.float32),
                   jax.ShapeDtypeStruct((B, N, D), jnp.float32),
                   jax.ShapeDtypeStruct((B, NC, S, D), jnp.float32)],
        interpret=_interpret(),
    )(k, v, a, q, g_av, g_a2)
    return gk, gv, gq_partial.sum(axis=1)


route_sweep.defvjp(_route_sweep_fwd, _route_sweep_bwd)


def route_sweep_reference(k, v, q):
    """Pure-jnp sweep (numerical reference for the kernel)."""
    a = jax.nn.softmax(jnp.einsum("bnd,bsd->bns", k, q), axis=-1)
    return a.sum(axis=1), jnp.einsum("bns,bnd->bsd", a, v), a
