"""IODINE tests (tiny shapes)."""

import numpy as np
import pytest

from ocrl_tpu.config import compose
from ocrl_tpu.models import create_ocr

TINY = [
    "ocr=iodine_large", "dataset=random-N5C4S4S2", "dataset.obs_size=16",
    "ocr.slot_size=8", "ocr.num_slots=3", "ocr.num_iterations=2",
    "ocr.ref_cnn_hidden_size=8", "ocr.ref_mlp_hidden_size=16",
    "ocr.ref_cnn_layers=2", "ocr.dec_cnn_hidden_size=8", "ocr.dec_cnn_layers=2",
]

OBS = np.random.default_rng(0).random((2, 16, 16, 3)).astype("float32")


@pytest.fixture(scope="module")
def iodine():
    cfg = compose("train_ocr", TINY)
    return create_ocr(cfg.ocr, cfg.dataset, seed=0)


def test_iodine_forward_and_training(iodine):
    rep = iodine(OBS)
    assert rep.shape == (2, 3, 8)
    m = iodine.update(OBS, None, 0)
    assert {"loss", "mse", "kld", "norm"} <= set(m)
    assert np.isfinite(float(m["loss"]))
    # L2-norm clipping configured (reference: configs/ocr/iodine_large.yaml)
    assert iodine.spec.clip == 5.0 and iodine.spec.clip_ord == 2.0


def test_iodine_eval_without_no_grad_issue(iodine):
    """Eval uses the same jitted fn — inner jax.grad works without torch's
    enable_grad workaround (reference: train_ocr.py:73)."""
    m = iodine.get_loss(OBS)
    assert {"loss", "mse", "kld"} == set(m)
    assert np.isfinite(float(m["loss"]))


def test_iodine_ari_and_masks(iodine):
    ids = np.random.default_rng(1).integers(0, 4, size=(2, 16 * 16))
    masks = np.eye(4)[ids].transpose(0, 2, 1).reshape(2, 4, 16, 16, 1)
    m = iodine.get_loss(OBS, masks.astype("float32"))
    assert "ari" in m and -0.5 <= float(m["ari"]) <= 1.0

    samples = iodine.get_samples(OBS)
    # obs + recon + 3*(masked, mask, means) panels wide
    assert samples["samples"].shape[0] == 2
    assert samples["samples"].shape[-1] == 3
