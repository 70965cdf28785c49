"""Shape/finite-loss/training tests for the simple OCR models."""

import numpy as np
import pytest

from ocrl_tpu.config import compose
from ocrl_tpu.models import create_ocr

OBS = np.random.default_rng(0).random((4, 32, 32, 3)).astype("float32")
OBS64 = np.random.default_rng(1).random((2, 64, 64, 3)).astype("float32")


def make(ocr_name, *over, dataset_over=("dataset.obs_size=32",)):
    cfg = compose("train_ocr",
                  [f"ocr={ocr_name}", "dataset=random-N5C4S4S2", *dataset_over, *over])
    return create_ocr(cfg.ocr, cfg.dataset, seed=0), cfg


def test_vae_shapes_and_training():
    model, _ = make("vae")
    rep = model(OBS)
    assert rep.shape == (4, 256)
    assert model.rep_dim == 256 and model.num_slots == 1

    m0 = model.update(OBS, None, 0)
    assert np.isfinite(float(m0["loss"]))
    for step in range(1, 6):
        m = model.update(OBS, None, step)
    assert float(m["loss"]) < float(m0["loss"])  # loss decreases on fixed batch

    val = model.get_loss(OBS)
    assert set(val) == {"loss", "mse", "kld"}
    s = model.get_samples(OBS[:2])
    assert s["samples"].shape == (2, 64, 32, 3)


def test_vae_cnn_feat_mode():
    model, _ = make("vae", "ocr.use_cnn_feat=True")
    rep = model(OBS)
    assert rep.shape == (4, 16, 64)
    assert model.rep_dim == 64 and model.num_slots == 16


def test_naturecnn():
    model, _ = make("naturecnn", dataset_over=())
    rep = model(OBS64)
    assert rep.shape == (2, 512)
    assert model.update(OBS64, None, 0) == {}
    assert model.get_loss(OBS64) == {}


def test_naturecnn_feat_modes():
    model, _ = make("naturecnn", "ocr.use_cnn_feat=True", "ocr.cnn_feat_size=2",
                    dataset_over=())
    rep = model(OBS64)
    assert rep.shape[0] == 2 and rep.shape[-1] == 128
    assert model.rep_dim == 128 and model.num_slots == 4


def test_multiple_cnn_slots_differ():
    model, _ = make("multiple_cnn", "ocr.num_modules=3", dataset_over=())
    rep = model(OBS64)
    assert rep.shape == (2, 3, 512)
    # independent per-module weights -> different slot features
    assert not np.allclose(np.asarray(rep[:, 0]), np.asarray(rep[:, 1]))


def test_gt_passthrough():
    cfg = compose("train_sb3", ["ocr=gt", "pooling=mlp", "sb3=ppo",
                                "sb3_acnet=mlp", "env=target-N4C4S3S1"])
    model = create_ocr(cfg.ocr, cfg.env, seed=0)
    state = np.random.rand(4, 5, 5).astype("float32")
    rep = model(state)
    np.testing.assert_array_equal(np.asarray(rep), state)
    assert model.rep_dim == 5 and model.num_slots == 5


def test_gt_mlp_head():
    cfg = compose("train_sb3", ["ocr=gt", "pooling=mlp", "sb3=ppo",
                                "sb3_acnet=mlp", "env=push-N3C4S1S1",
                                "ocr.dims=[32,16]", "ocr.acts=[relu,relu]"])
    model = create_ocr(cfg.ocr, cfg.env, seed=0)
    assert model.rep_dim == 16 and model.num_slots == 5  # N3 + goal + agent
    state = np.random.rand(4, 5, 5).astype("float32")
    assert model(state).shape == (4, 5, 16)


def test_checkpoint_roundtrip_through_wrapper(tmp_path):
    from ocrl_tpu import utils

    model, _ = make("vae")
    model.update(OBS, None, 0)
    utils.save(model, tmp_path, step=1, epoch=0, best_val_loss=1.0, best=True)

    model2, _ = make("vae")
    step, epoch, best = utils.load(model2, run_dir=tmp_path)
    assert step == 1 and best == 1.0
    np.testing.assert_allclose(np.asarray(model2(OBS)), np.asarray(model(OBS)),
                               rtol=1e-6)


def test_update_many_scanned_steps():
    """update_many(k) = k scanned optimizer steps in one dispatch: stacked
    metrics, advancing loss, deterministic given the wrapper rng state."""
    model, _ = make("vae")
    sb = np.concatenate([OBS] * 3)  # k=3 superbatch (12 rows of batch 4)
    m = model.update_many(sb, None, 0, 3)
    assert m["loss"].shape == (3,)
    assert np.all(np.isfinite(np.asarray(m["loss"])))
    assert model._last_step == 2

    # a second call continues training: losses keep falling on the fixed batch
    m2 = model.update_many(sb, None, 3, 3)
    assert float(np.asarray(m2["loss"])[-1]) < float(np.asarray(m["loss"])[0])

    # reproducible: a fresh model with the same seed takes the same trajectory
    model_b, _ = make("vae")
    mb = model_b.update_many(sb, None, 0, 3)
    np.testing.assert_allclose(np.asarray(mb["loss"]), np.asarray(m["loss"]),
                               rtol=1e-6)


def test_update_many_uint8_and_masks_none():
    model, _ = make("vae")
    sb8 = (np.concatenate([OBS] * 2) * 255).astype(np.uint8)
    m = model.update_many(sb8, None, 0, 2)
    assert m["loss"].shape == (2,)


def test_grad_norm_logging():
    """ocr.learning.log_grad_norms=True adds per-module gradient norms
    (the reference's wandb.watch equivalent, ocrs/base.py:30-31)."""
    model, _ = make("vae", "+ocr.learning.log_grad_norms=True")
    m = model.update(OBS, None, 0)
    mods = [k for k in m if k.startswith("grad_norm/")]
    assert mods, f"no grad_norm metrics in {sorted(m)}"
    assert all(np.isfinite(float(np.asarray(m[k]))) for k in mods)
