"""SLATE correctness tests (tiny shapes; single shared model per mode)."""

import numpy as np
import pytest

from ocrl_tpu.config import compose
from ocrl_tpu.models import create_ocr

TINY = [
    "ocr=slate", "dataset=random-N5C4S4S2", "dataset.obs_size=16",
    "ocr.dvae.vocab_size=64", "ocr.dvae.d_model=32", "ocr.cnn.hidden_size=16",
    "ocr.slotattr.num_slots=3", "ocr.slotattr.slot_size=32",
    "ocr.slotattr.mlp_hidden_size=32", "ocr.tfdec.num_dec_blocks=2",
    "ocr.tfdec.num_dec_heads=2",
]

OBS = np.random.default_rng(0).random((2, 16, 16, 3)).astype("float32")


@pytest.fixture(scope="module")
def slate():
    cfg = compose("train_ocr", TINY)
    return create_ocr(cfg.ocr, cfg.dataset, seed=0)


@pytest.fixture(scope="module")
def slotattn_model():
    # short lr warmup so the handful of test steps train at a real lr
    # (the default 30k-step warmup leaves step<15 at ~1e-8, where the loss
    # trajectory is dominated by slot-init sampling noise)
    cfg = compose("train_ocr", TINY + ["ocr.use_bcdec=True",
                                       "ocr.learning.lr_warmup_steps=10"])
    return create_ocr(cfg.ocr, cfg.dataset, seed=0)


def test_slate_shapes_and_training(slate):
    rep = slate(OBS)
    assert rep.shape == (2, 3, 32)
    m0 = slate.update(OBS, None, 0)
    assert np.isfinite(float(m0["loss"]))
    assert {"loss", "dvae_mse", "cross_entropy", "tau", "norm"} <= set(m0)
    assert float(m0["tau"]) == pytest.approx(1.0)
    # tau anneals, lr warms up
    m = slate.update(OBS, None, 15000)
    assert float(m["tau"]) < 1.0
    assert float(m["lr_enc"]) > float(m0["lr_enc"])


def test_slate_gen_consistency(slate):
    """KV-cached greedy decode must agree with the teacher-forced transformer
    re-run on its own output (exactness of the cache path)."""
    import jax
    import jax.numpy as jnp

    module, params = slate.spec.module, slate.params
    rngs = {"noise": jax.random.PRNGKey(1), "noise2": jax.random.PRNGKey(2)}
    slots, _ = module.apply({"params": params}, OBS, method="get_slots", rngs=rngs)
    tokens = module.apply({"params": params}, slots, method="gen_tokens")
    assert tokens.shape == (2, 16)

    def teacher_check(mdl, slots, tokens):
        B, T = tokens.shape
        z_emb = mdl.dictionary(tokens)
        z_emb = jnp.concatenate(
            [jnp.broadcast_to(mdl.bos, (B, 1, z_emb.shape[-1])), z_emb], axis=1)
        z_emb = mdl.z_pos(z_emb, deterministic=True)
        decoded = mdl.tfdec(z_emb[:, :-1], mdl.slotproj(slots), deterministic=True)
        return jnp.argmax(mdl.out(decoded), axis=-1)

    pred = module.apply({"params": params}, slots, tokens, method=teacher_check)
    np.testing.assert_array_equal(np.asarray(pred), np.asarray(tokens))


def test_slate_ari_with_masks(slate):
    # fabricate masks: 5 object channels + background, partitioning the image
    rng = np.random.default_rng(3)
    ids = rng.integers(0, 6, size=(2, 16 * 16))
    masks = np.eye(6)[ids].transpose(0, 2, 1).reshape(2, 6, 16, 16, 1)
    m = slate.get_loss(OBS, masks.astype("float32"))
    assert "ari" in m and -0.5 <= float(m["ari"]) <= 1.0


def test_slotattention_bcdec_mode(slotattn_model):
    m0 = slotattn_model.update(OBS, None, 0)
    assert set(m0) == {"loss", "mse", "norm"}
    losses = [float(m0["loss"])]
    for step in range(1, 40):
        losses.append(float(slotattn_model.update(OBS, None, step)["loss"]))
    # broadcast decoder learns the fixed batch (averaged ends: slot init is
    # sampled per call, so single-step comparisons are noisy)
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    s = slotattn_model.get_samples(OBS)
    assert s["samples"].shape == (2, 16, 16 * 5, 3)  # obs, recon, 3 slot attns


def test_slot_attention_matches_reference_math():
    """Golden-value test: one slot-attention iteration vs a straight numpy
    transcription of the reference equations (slot_attn.py:64-101)."""
    import jax
    from ocrl_tpu.models.slot_attention import SlotAttention

    B, N_kv, N_q, D = 2, 7, 3, 8
    heads = 2
    rng = np.random.default_rng(5)
    inputs = rng.standard_normal((B, N_kv, D)).astype("float32")
    slots0 = rng.standard_normal((B, N_q, D)).astype("float32")

    sa = SlotAttention(num_iterations=1, num_slots=N_q, input_size=D,
                       slot_size=D, mlp_hidden_size=D, num_heads=heads)
    params = sa.init(jax.random.PRNGKey(0), inputs, slots0)["params"]
    out_slots, attn_vis = sa.apply({"params": params}, inputs, slots0)

    # ---- numpy re-derivation of one iteration ----
    def ln(x, scale, bias):
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + 1e-6) * scale + bias

    p = jax.tree.map(np.asarray, params)
    x = ln(inputs, p["norm_inputs"]["scale"], p["norm_inputs"]["bias"])
    hd = D // heads
    k = (x @ p["project_k"]["kernel"]).reshape(B, N_kv, heads, hd).transpose(0, 2, 1, 3)
    k = k * hd ** -0.5
    v = (x @ p["project_v"]["kernel"]).reshape(B, N_kv, heads, hd).transpose(0, 2, 1, 3)

    s_norm = ln(slots0, p["norm_slots"]["scale"], p["norm_slots"]["bias"])
    q = (s_norm @ p["project_q"]["kernel"]).reshape(B, N_q, heads, hd).transpose(0, 2, 1, 3)
    logits = np.einsum("bhnd,bhsd->bhns", k, q)
    flat = logits.transpose(0, 2, 1, 3).reshape(B, N_kv, heads * N_q)
    e = np.exp(flat - flat.max(-1, keepdims=True))
    attn = (e / e.sum(-1, keepdims=True)).reshape(B, N_kv, heads, N_q).transpose(0, 2, 1, 3)
    expected_vis = attn.sum(1)
    attn = attn + 1e-8
    attn = attn / attn.sum(-2, keepdims=True)
    updates = np.einsum("bhns,bhnd->bhsd", attn, v).transpose(0, 2, 1, 3).reshape(B, N_q, D)

    # FusedGRUCell (torch semantics), kernels [in, 3*feat] with r|z|n blocks
    gp = p["gru"]
    x_in = updates.reshape(-1, D)
    h = slots0.reshape(-1, D)
    zi = x_in @ gp["wi"] + gp["bi"]
    zh = h @ gp["wh"] + gp["bh"]
    r = 1 / (1 + np.exp(-(zi[:, :D] + zh[:, :D])))
    z = 1 / (1 + np.exp(-(zi[:, D:2 * D] + zh[:, D:2 * D])))
    n = np.tanh(zi[:, 2 * D:] + r * zh[:, 2 * D:])
    h_new = (1 - z) * n + z * h
    slots = h_new.reshape(B, N_q, D)
    s2 = ln(slots, p["norm_mlp"]["scale"], p["norm_mlp"]["bias"])
    mlp = p["mlp"]["layers_0"]["kernel"], p["mlp"]["layers_0"]["bias"], \
        p["mlp"]["layers_2"]["kernel"], p["mlp"]["layers_2"]["bias"]
    hmid = np.maximum(s2 @ mlp[0] + mlp[1], 0.0)
    expected_slots = slots + (hmid @ mlp[2] + mlp[3])

    # atol covers flax LayerNorm fast-variance precision; a wrong softmax
    # direction would diverge at O(1)
    np.testing.assert_allclose(np.asarray(attn_vis), expected_vis, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out_slots), expected_slots, atol=2e-2)


def test_gumbel_softmax_straight_through():
    import jax
    import jax.numpy as jnp
    from ocrl_tpu.models.common import gumbel_softmax

    logits = jnp.array([[2.0, 0.0, -1.0]])
    hard = gumbel_softmax(jax.random.PRNGKey(0), logits, tau=1.0, hard=True)
    row = np.asarray(hard)[0]
    assert set(np.round(row, 5)) <= {0.0, 1.0} and row.sum() == 1.0

    # straight-through: gradient w.r.t. logits equals soft-sample gradient
    def f(lg):
        return jnp.sum(gumbel_softmax(jax.random.PRNGKey(0), lg, 1.0, True) *
                       jnp.array([[1.0, 2.0, 3.0]]))

    g = jax.grad(f)(logits)
    assert np.all(np.isfinite(np.asarray(g))) and np.abs(np.asarray(g)).sum() > 0


def test_bcdec_restructured_conv1_matches_naive():
    """The 5x5-grid/tile evaluation of conv1 over the spatially-constant
    broadcast input must EXACTLY match the naive full-resolution conv
    (linearity + border-pattern coverage; models/dvae.py)."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from ocrl_tpu.models.dvae import BroadCastDecoder

    dec = BroadCastDecoder(obs_size=16, obs_channels=3, hidden_size=8,
                           slot_size=12)
    slots = np.random.default_rng(1).standard_normal((2, 3, 12)).astype("float32")
    params = dec.init(jax.random.PRNGKey(0), slots)["params"]
    fast = dec.apply({"params": params}, slots)

    def naive(mod, slots):
        B, N, D = slots.shape
        H = W = mod.obs_size
        grid = jnp.broadcast_to(slots.reshape(B * N, 1, 1, D), (B * N, H, W, D))
        out = mod.rest(nn.relu(mod.conv1(mod.pos_emb(grid))))
        img = out[..., : mod.obs_channels].reshape(B, N, H, W, mod.obs_channels)
        masks = jax.nn.softmax(out[..., -1:].reshape(B, N, H, W, 1), axis=1)
        return (img * masks).sum(axis=1)

    ref = dec.apply({"params": params}, slots, method=naive)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_bcdec_checkpoint_migration():
    """Pre-round-4 blocks/layers_* checkpoints load into the conv1/rest
    layout via migrate_bcdec_tree (params and any opt-state mirror)."""
    import jax
    from flax import serialization
    from ocrl_tpu.models.dvae import BroadCastDecoder
    from ocrl_tpu.utils.checkpoint import migrate_bcdec_tree

    dec = BroadCastDecoder(obs_size=16, obs_channels=3, hidden_size=8,
                           slot_size=12)
    slots = np.zeros((1, 2, 12), "float32")
    params = dec.init(jax.random.PRNGKey(0), slots)["params"]
    sd = serialization.to_state_dict(params)
    old = {"bcdec": {
        "pos_emb": sd["pos_emb"],
        "blocks": {
            "layers_0": {"Conv_0": sd["conv1"]},
            "layers_1": sd["rest"]["layers_0"],
            "layers_2": sd["rest"]["layers_1"],
            "layers_3": sd["rest"]["layers_2"],
        }}}
    migrated = migrate_bcdec_tree({"params": old, "opt": {"mu": old}})
    expect = {"params": {"bcdec": sd}, "opt": {"mu": {"bcdec": sd}}}
    assert (jax.tree_util.tree_structure(migrated)
            == jax.tree_util.tree_structure(expect))
    assert all(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: bool(np.asarray(a == b).all()), migrated, expect)))


def test_slate_amp_bf16_trains_f32_params():
    """ocr.amp=bf16: conv stacks compute in bf16, params and loss stay f32,
    one update step is finite and changes params."""
    import jax
    cfg = compose("train_ocr", TINY + ["ocr.amp=bf16"])
    model = create_ocr(cfg.ocr, cfg.dataset, seed=0)
    m = model.update(OBS, None, 0)
    assert np.isfinite(float(m["loss"]))
    leaves = jax.tree_util.tree_leaves(model.params)
    assert all(l.dtype == np.float32 for l in leaves)
