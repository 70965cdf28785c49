"""Pooling module and wrapper tests."""

import numpy as np
import pytest

from ocrl_tpu.config import compose
from ocrl_tpu.models import create_ocr
from ocrl_tpu.poolings import Pooling, create_pooling_module, pooled_dim

import jax
import jax.numpy as jnp

REP = np.random.default_rng(0).random((3, 5, 16)).astype("float32")  # [B,N,D]


def pool_cfg(name, *over):
    cfg = compose("train_sb3", [f"pooling={name}", "ocr=gt", "sb3=ppo",
                                "sb3_acnet=mlp", "env=target-N4C4S3S1", *over])
    return cfg.pooling


@pytest.mark.parametrize("name,cls_name,expected_dim", [
    ("transformer", "Transformer", 128),
    ("rn", "RN", 64),
    ("mlp", "MLP", 128),
    ("identity", "Identity", 5 * 16),
])
def test_pooling_shapes(name, cls_name, expected_dim):
    cfg = pool_cfg(name)
    module = create_pooling_module(cfg.name, 16, 5, cfg)
    params = jax.jit(module.init)(jax.random.PRNGKey(0), REP).get("params", {})
    out = module.apply({"params": params}, REP)
    assert out.shape == (3, expected_dim)
    assert pooled_dim(cfg.name, cfg, 16, 5) == expected_dim


def test_cnn_poolings_on_feature_grid():
    # cnn poolings consume feature-map-as-slots (e.g. 64x64 grid of 8-dim)
    grid_rep = np.random.default_rng(1).random((2, 64 * 64, 8)).astype("float32")
    for name, dim in [("cnn_linear", 512), ("cnn_transformer", 128)]:
        cfg = pool_cfg(name)
        module = create_pooling_module(cfg.name, 8, 64 * 64, cfg)
        params = jax.jit(module.init)(jax.random.PRNGKey(0), grid_rep).get("params", {})
        out = module.apply({"params": params}, grid_rep)
        assert out.shape == (2, dim), name


def test_transformer_pos_and_stacked_variants():
    cfg = pool_cfg("transformer", "pooling.pos_emb=ape")
    module = create_pooling_module(cfg.name, 16, 5, cfg)
    params = jax.jit(module.init)(jax.random.PRNGKey(0), REP).get("params", {})
    assert module.apply({"params": params}, REP).shape == (3, 128)

    stacked = np.random.default_rng(2).random((3, 10, 16)).astype("float32")
    module = create_pooling_module(cfg.name, 5, 5, cfg, num_stacked_obss=2)
    params = jax.jit(module.init)(jax.random.PRNGKey(0), stacked).get("params", {})
    assert module.apply({"params": params}, stacked).shape == (3, 128)


def test_pooling_wrapper_frozen_and_aux():
    ocr_cfg = compose("train_ocr", [
        "ocr=vae", "dataset=random-N5C4S4S2", "dataset.obs_size=16",
        "ocr.use_cnn_feat=True", "ocr.cnn_feat_size=4"])
    ocr = create_ocr(ocr_cfg.ocr, ocr_cfg.dataset, seed=0)

    cfg = pool_cfg("transformer")
    pooling = Pooling(ocr, cfg, seed=0)
    obs = np.random.default_rng(3).random((2, 16, 16, 3)).astype("float32")
    out = pooling(obs)
    assert out.shape == (2, 128)

    cfg_aux = pool_cfg("transformer", "pooling.learn_aux_loss=True")
    pooling_aux = Pooling(ocr, cfg_aux, seed=0)
    pooled, metrics = pooling_aux(obs, with_loss=True)
    assert pooled.shape == (2, 128)
    assert "aux_loss" in metrics and np.isfinite(float(metrics["aux_loss"]))

    # checkpoint roundtrip nests pooling + ocr states
    ckpt = pooling.save()
    assert "pooling_module_state_dict" in ckpt and "ocr_module_state_dict" in ckpt
    pooling.load(ckpt)


def test_pretrained_ocr_loading(tmp_path):
    from ocrl_tpu import utils
    from ocrl_tpu.poolings import get_ocr

    ocr_cfg = compose("train_ocr", ["ocr=vae", "dataset=random-N5C4S4S2",
                                    "dataset.obs_size=16"])
    ocr = create_ocr(ocr_cfg.ocr, ocr_cfg.dataset, seed=0)
    obs = np.random.default_rng(4).random((2, 16, 16, 3)).astype("float32")
    ocr.update(obs, None, 0)
    utils.save(ocr, tmp_path, step=1, best=True)

    cpt = compose("train_sb3", ["ocr=vae", "pooling=mlp", "sb3=ppo",
                                "sb3_acnet=mlp", "env=target-N4C4S3S1",
                                f"pooling.ocr_checkpoint.local_file={tmp_path}/checkpoints/model_best.ckpt"]
                  ).pooling.ocr_checkpoint
    ocr2, pretrained = get_ocr(ocr_cfg.ocr, ocr_cfg.dataset, cpt, seed=7)
    assert pretrained
    np.testing.assert_allclose(np.asarray(ocr2(obs)), np.asarray(ocr(obs)), rtol=1e-6)


def test_sinusoid_lookup_matches_table():
    """_sinusoid_lookup computes sinusoid-table rows analytically (O(1)
    memory) — golden check against the materialised table at a small
    max_len (reference builds the full (10M+1)-row table:
    transformer_module.py:72-86)."""
    from ocrl_tpu.poolings.modules import _sinusoid_lookup, sinusoid_table

    max_len, d_model = 997, 32
    table = sinusoid_table(max_len + 1, d_model)
    x = np.linspace(-1.2, 1.2, 41).astype("float32")  # incl. out-of-range clip
    got = np.asarray(_sinusoid_lookup(jnp.asarray(x), d_model, max_len))
    idx = np.clip(np.floor(np.clip((x + 1) / 2, 0, 1) * max_len).astype(int),
                  0, max_len)
    np.testing.assert_allclose(got, table[idx], rtol=1e-5, atol=1e-5)


def test_push_and_cw_embedding_paths():
    """push_embedding / cw_embedding forward shapes (reference:
    transformer_module.py:60-118) — these feed the GT/Push and CausalWorld
    benchmark rows."""
    B, K = 2, 5
    # push: per-object rows [color_idx, shape_idx, ..., x, y]
    state = np.zeros((B, K, 6), np.float32)
    state[:, :, 0] = np.arange(K) % 4          # color ids
    state[:, :, 1] = np.arange(K) % 3          # shape ids
    state[:, :, -2:] = np.random.default_rng(3).uniform(-1, 1, (B, K, 2))
    cfg = pool_cfg("transformer", "pooling.push_embedding=True")
    module = create_pooling_module(cfg.name, 6, K, cfg)
    params = jax.jit(module.init)(jax.random.PRNGKey(0), state).get("params", {})
    assert module.apply({"params": params}, state).shape == (B, 128)

    # cw: row 0 carries the 28-dim arm state, rows 1.. carry object features
    cw_state = np.random.default_rng(4).uniform(-1, 1, (B, K, 38)).astype("float32")
    cfg = pool_cfg("transformer", "pooling.cw_embedding=True")
    module = create_pooling_module(cfg.name, 38, K, cfg)
    params = jax.jit(module.init)(jax.random.PRNGKey(0), cw_state).get("params", {})
    assert module.apply({"params": params}, cw_state).shape == (B, 128)
