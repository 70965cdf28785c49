"""MAE tests (tiny ViT)."""

import numpy as np
import pytest

from ocrl_tpu.config import compose
from ocrl_tpu.models import create_ocr

TINY = ["ocr=mae", "dataset=random-N5C4S4S2", "dataset.obs_size=16",
        "ocr.vit_size=tiny", "ocr.patch_size=4"]

OBS = np.random.default_rng(0).random((2, 16, 16, 3)).astype("float32")


@pytest.fixture(scope="module")
def mae():
    cfg = compose("train_ocr", TINY)
    return create_ocr(cfg.ocr, cfg.dataset, seed=0)


def test_mae_patch_roundtrip(mae):
    module = mae.spec.module
    import jax

    patches = module.apply({"params": mae.params}, OBS, method="patchify")
    assert patches.shape == (2, 16, 4 * 4 * 3)
    back = module.apply({"params": mae.params}, patches, method="unpatchify")
    np.testing.assert_allclose(np.asarray(back), OBS, atol=1e-6)


def test_mae_rep_modes(mae):
    rep = mae(OBS)
    assert rep.shape == (2, 16, 32)  # all patch tokens
    assert mae.rep_dim == 32 and mae.num_slots == 16

    cfg = compose("train_ocr", TINY + ["ocr.return_cls=True"])
    mae_cls = create_ocr(cfg.ocr, cfg.dataset, seed=0)
    assert mae_cls(OBS).shape == (2, 32)
    assert mae_cls.num_slots == 1


def test_mae_training_and_masked_loss(mae):
    m0 = mae.update(OBS, None, 0)
    assert np.isfinite(float(m0["loss"]))
    for step in range(1, 6):
        m = mae.update(OBS, None, step)
    assert float(m["loss"]) < float(m0["loss"])
    s = mae.get_samples(OBS)
    assert s["samples"].shape == (2, 48, 16, 3)  # obs/masked/paste stacked on H
