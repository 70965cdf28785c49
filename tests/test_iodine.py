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


def test_iodine_decoder_restructure_matches_naive_conv():
    """Decoder's grid-evaluated first conv must equal the naive full-res conv
    over concat(broadcast(slot), coords) (linearity + border coverage)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from ocrl_tpu.models.iodine import Decoder

    B, K, L, H = 2, 3, 5, 9
    dec = Decoder(dim_hidden=6, n_layers=1, kernel_size=3, img_size=H)
    slots = np.random.default_rng(0).standard_normal((B, K, L)).astype("float32")
    params = dec.init(jax.random.PRNGKey(1), slots)["params"]
    recons, mask_logits = dec.apply({"params": params}, slots)

    # naive: full-resolution conv over the broadcast input
    x = jnp.broadcast_to(slots.reshape(B * K, 1, 1, L), (B * K, H, H, L))
    yy, xx = jnp.meshgrid(jnp.linspace(-1, 1, H), jnp.linspace(-1, 1, H),
                          indexing="ij")
    coords = jnp.broadcast_to(jnp.stack([xx, yy], -1)[None], (B * K, H, H, 2))
    x = jnp.concatenate([x, coords], -1)

    def conv(x, p):
        y = lax.conv_general_dilated(
            x, p["kernel"], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + p["bias"]

    y = jax.nn.elu(conv(x, params["Conv_0"]))
    y = conv(y, params["Conv_1"])
    np.testing.assert_allclose(
        np.asarray(recons),
        np.asarray(y[..., :3].reshape(B, K, H, H, 3)), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(mask_logits),
        np.asarray(y[..., 3:].reshape(B, K, H, H, 1)), atol=3e-5, rtol=1e-4)
