"""Tests for Pallas ops (jnp fallback path on CPU; kernels exercise on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ocrl_tpu.ops import gumbel_argmax_ids, gumbel_softmax_sample


def test_soft_sample_is_distribution_and_differentiable():
    logits = jnp.asarray(np.random.default_rng(0).standard_normal((32, 128),
                                                                  dtype="float32"))
    y = gumbel_softmax_sample(logits, jax.random.PRNGKey(0), 1.0)
    np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, atol=1e-4)
    assert float(y.min()) >= 0.0

    g = jax.grad(lambda l: jnp.sum(
        gumbel_softmax_sample(l, jax.random.PRNGKey(0), 1.0) *
        jnp.arange(128)))(logits)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_soft_sample_custom_vjp_matches_autodiff():
    """The custom bwd (softmax jacobian / tau) must equal jax autodiff of the
    same function with the same noise."""
    rng = jax.random.PRNGKey(3)
    logits = jnp.asarray(np.random.default_rng(1).standard_normal((8, 16),
                                                                  dtype="float32"))
    tau = 0.7
    eps = jnp.finfo(jnp.float32).tiny
    g_noise = -jnp.log(jax.random.exponential(rng, logits.shape) + eps)
    w = jnp.asarray(np.random.default_rng(2).standard_normal((8, 16), dtype="float32"))

    def explicit(l):
        return jnp.sum(jax.nn.softmax((l + g_noise) / tau, -1) * w)

    auto = jax.grad(explicit)(logits)

    # replicate via the custom vjp formula on the same y
    y = jax.nn.softmax((logits + g_noise) / tau, -1)
    inner = jnp.sum(w * y, axis=-1, keepdims=True)
    manual = y * (w - inner) / tau
    np.testing.assert_allclose(np.asarray(auto), np.asarray(manual), atol=1e-5)


def test_argmax_ids_distribution():
    # one row repeated: empirical frequencies ~ softmax(logits)
    row = np.full((1, 128), -1e9, dtype="float32")
    row[0, :4] = [2.0, 1.0, 0.0, -1.0]
    big = jnp.asarray(np.tile(row, (4096, 1)))
    ids = np.asarray(gumbel_argmax_ids(big, jax.random.PRNGKey(0)))
    freq = np.bincount(ids, minlength=4)[:4] / 4096
    expected = np.exp([2.0, 1.0, 0.0, -1.0])
    expected /= expected.sum()
    np.testing.assert_allclose(freq, expected, atol=0.05)


def test_argmax_ids_blocks_gradients():
    logits = jnp.asarray(np.random.default_rng(5).standard_normal((4, 8),
                                                                  dtype="float32"))

    def f(l):
        ids = gumbel_argmax_ids(l, jax.random.PRNGKey(0))
        return jnp.sum(l * jax.nn.one_hot(ids, 8))

    g = jax.grad(f)(logits)  # grads flow through l but not through ids
    assert np.isfinite(np.asarray(g)).all()


def test_route_sweep_fwd_matches_reference():
    """Chunked routing sweep vs jnp: S_a / A_v accumulation across chunks
    and the per-token slot softmax must match exactly."""
    import jax
    import jax.numpy as jnp
    from ocrl_tpu.ops.slot_routing import (
        pick_chunk, route_sweep, route_sweep_reference)

    B, N, S, D = 2, 32, 3, 16
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)

    chunk = pick_chunk(N, target=8)     # 4 chunks -> exercises accumulation
    assert chunk == 8
    sa, av, a = route_sweep(chunk, k, v, q)
    sa_r, av_r, a_r = route_sweep_reference(k, v, q)
    np.testing.assert_allclose(np.asarray(a), np.asarray(a_r),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sa), np.asarray(sa_r),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(av), np.asarray(av_r),
                               rtol=2e-5, atol=2e-5)
    assert np.allclose(np.asarray(a).sum(-1), 1.0, atol=1e-5)


def test_route_sweep_grads_match_reference():
    """Hand-written single-sweep VJP vs jnp autodiff — all three outputs'
    cotangents exercised, multi-chunk."""
    import jax
    import jax.numpy as jnp
    from ocrl_tpu.ops.slot_routing import route_sweep, route_sweep_reference

    B, N, S, D = 2, 32, 3, 8
    rng = np.random.default_rng(1)
    k = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)
    t_sa = jnp.asarray(rng.normal(size=(B, S)), jnp.float32)
    t_av = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)
    t_a = jnp.asarray(rng.normal(size=(B, N, S)), jnp.float32)

    def loss(fn, k, v, q):
        sa, av, a = fn(k, v, q)
        return (jnp.sum(sa * t_sa) + jnp.sum(jnp.tanh(av) * t_av)
                + jnp.sum(jnp.tanh(a) * t_a))

    g = jax.grad(lambda *x: loss(lambda *y: route_sweep(8, *y), *x),
                 argnums=(0, 1, 2))(k, v, q)
    gr = jax.grad(lambda *x: loss(route_sweep_reference, *x),
                  argnums=(0, 1, 2))(k, v, q)
    for name, a_, b_ in [("k", g[0], gr[0]), ("v", g[1], gr[1]),
                         ("q", g[2], gr[2])]:
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_), rtol=1e-4,
                                   atol=1e-5, err_msg=name)


def test_pick_chunk():
    from ocrl_tpu.ops.slot_routing import pick_chunk

    assert pick_chunk(4096) == 512
    assert pick_chunk(4096, target=256) == 256
    assert pick_chunk(48) == 16
    assert pick_chunk(7) == 0          # prime -> jnp fallback


def test_slot_attention_module_fused_matches_jnp():
    """SlotAttention(fused=always) must reproduce the jnp loop exactly
    (same params, same slot-init noise) — outputs AND gradients."""
    from ocrl_tpu.models.slot_attention import SlotAttention

    B, N, D, S = 2, 16, 16, 3
    rng = np.random.default_rng(2)
    inputs = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    slots0 = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)

    def build(fused):
        m = SlotAttention(num_iterations=3, num_slots=S, input_size=D,
                          slot_size=D, mlp_hidden_size=D, num_heads=1,
                          fused=fused)
        v = m.init({"params": jax.random.PRNGKey(0)}, inputs, slots0)
        return m, v

    m_j, v_j = build("never")
    m_f, v_f = build("always")
    jax.tree.map(np.testing.assert_array_equal, v_j, v_f)  # same init

    out_j = m_j.apply(v_j, inputs, slots0)
    out_f = m_f.apply(v_f, inputs, slots0)
    np.testing.assert_allclose(np.asarray(out_f[0]), np.asarray(out_j[0]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_f[1]), np.asarray(out_j[1]),
                               rtol=2e-5, atol=2e-5)

    def loss(m, v):
        s, a = m.apply(v, inputs, slots0)
        return jnp.sum(s ** 2) + jnp.sum(a ** 2)

    g_j = jax.grad(lambda v: loss(m_j, v))(v_j)
    g_f = jax.grad(lambda v: loss(m_f, v))(v_f)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5), g_j, g_f)


def test_route_sweep_under_vmap():
    """jax.vmap prepends a grid axis to pallas_call — values and VJP must
    survive it (the RL act path runs the sweep under a seed vmap; mosaic
    rejected the pre-round-3 layout there on real hardware)."""
    import jax
    import jax.numpy as jnp
    from ocrl_tpu.ops.slot_routing import route_sweep, route_sweep_reference

    V, B, N, S, D = 3, 2, 32, 5, 16
    rng = np.random.default_rng(4)
    k = jnp.asarray(rng.normal(size=(V, B, N, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(V, B, N, D)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(V, B, S, D)), jnp.float32)

    out = jax.vmap(lambda *a: route_sweep(8, *a))(k, v, q)
    ref = jax.vmap(route_sweep_reference)(k, v, q)
    for a_, b_ in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=2e-5, atol=2e-5)

    def loss(fn, k, v, q):
        sa, av, a = jax.vmap(fn)(k, v, q)
        return jnp.sum(jnp.tanh(av)) + jnp.sum(jnp.tanh(a)) + jnp.sum(sa ** 2)

    g = jax.grad(lambda *x: loss(lambda *y: route_sweep(8, *y), *x),
                 argnums=(0, 1, 2))(k, v, q)
    gr = jax.grad(lambda *x: loss(route_sweep_reference, *x),
                  argnums=(0, 1, 2))(k, v, q)
    for name, a_, b_ in zip("kvq", g, gr):
        # slightly looser than the unvmapped test: the sa**2 loss term
        # amplifies accumulation-order noise across the vmap axis
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_), rtol=1e-3,
                                   atol=5e-5, err_msg=name)
