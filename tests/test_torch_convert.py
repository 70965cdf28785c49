"""torch->flax weight-converter parity: a reference-format SLATE checkpoint
must reproduce forward computations to <=1e-4 (SURVEY §7 "checkpoint
compatibility").  Skipped when /root/reference is unavailable."""

from pathlib import Path

import numpy as np
import pytest

from ocrl_tpu.config import compose
from ocrl_tpu.models import create_ocr
from ocrl_tpu.utils.torch_convert import (
    convert_ocr_state_dict, load_reference_checkpoint)

needs_reference = pytest.mark.skipif(
    not Path("/root/reference/ocrs").is_dir(),
    reason="reference torch implementation not available")

TOL = 1e-4


@pytest.fixture(scope="module")
def pair():
    """(torch SLATE module, flax OCR wrapper with converted params, cfg)."""
    import _reference_stubs
    _reference_stubs.install()
    import importlib

    cfg = compose("train_ocr", ["ocr=slate", "dataset=random-N5C4S4S2"])
    slate_module = importlib.import_module("ocrs.slate.slate_module")
    import torch

    torch.manual_seed(0)
    tm = slate_module.SLATE_Module(cfg.ocr, cfg.dataset).eval()
    ocr = create_ocr(cfg.ocr, cfg.dataset, seed=0)
    ocr.params = convert_ocr_state_dict(tm.state_dict(), ocr.params, "SLATE")
    return tm, ocr, cfg


def _nchw(x):
    import torch

    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


@needs_reference
def test_full_state_dict_converts(pair):
    tm, ocr, _ = pair
    # conversion walked every flax param without KeyError/shape mismatch;
    # spot-check one transposed linear and one conv
    import jax

    flat = dict(jax.tree_util.tree_flatten_with_path(ocr.params)[0])
    sd = tm.state_dict()
    np.testing.assert_allclose(
        np.asarray(ocr.params["out"]["kernel"]),
        sd["_out.weight"].numpy().T, rtol=0, atol=0)


@needs_reference
def test_dvae_encoder_logits_parity(pair):
    import torch

    tm, ocr, _ = pair
    obs = np.random.default_rng(0).random((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm._dvae._encoder(_nchw(obs)).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(ocr.spec.module.apply(
        {"params": ocr.params}, obs, method=lambda m, o: m.dvae.encode_logits(o)))
    np.testing.assert_allclose(got, ref, atol=TOL)


@needs_reference
def test_dvae_decoder_parity(pair):
    import torch

    tm, ocr, cfg = pair
    rng = np.random.default_rng(1)
    ids = rng.integers(0, cfg.ocr.dvae.vocab_size, size=(2, 16, 16))
    z = np.eye(cfg.ocr.dvae.vocab_size, dtype=np.float32)[ids]  # [B,h,w,V]
    with torch.no_grad():
        ref = tm._dvae.decode(_nchw(z)).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(ocr.spec.module.apply(
        {"params": ocr.params}, z, method=lambda m, x: m.dvae.decode(x)))
    np.testing.assert_allclose(got, ref, atol=TOL)


@needs_reference
def test_cnn_encoder_and_posemb_parity(pair):
    """Covers the conv stack AND the fixed position grid the reference keeps
    as a buffer (recomputed here)."""
    import torch

    tm, ocr, _ = pair
    obs = np.random.default_rng(2).random((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm._enc_pos(tm._enc(_nchw(obs))).numpy()  # [B,C,H,W]
        ref = ref.transpose(0, 2, 3, 1).reshape(2, -1, ref.shape[1])
    got = np.asarray(ocr.spec.module.apply(
        {"params": ocr.params}, obs, method=lambda m, o: m._emb(o)))
    np.testing.assert_allclose(got, ref, atol=TOL)


@needs_reference
def test_slot_attention_routing_parity(pair):
    """Same features + same initial slots through both routing loops
    (3 iterations of inverted softmax / renorm / GRU / MLP)."""
    import torch

    tm, ocr, cfg = pair
    rng = np.random.default_rng(3)
    feats = rng.standard_normal((2, 256, cfg.ocr.cnn.hidden_size)).astype(np.float32)
    slots0 = rng.standard_normal(
        (2, cfg.ocr.slotattr.num_slots, cfg.ocr.slotattr.slot_size)).astype(np.float32)
    with torch.no_grad():
        x_t = tm._slotattn.mlp(tm._slotattn.layer_norm(torch.from_numpy(feats)))
        ref_slots, ref_attn = tm._slotattn.slot_attention(
            x_t, torch.from_numpy(slots0))

    def flax_route(m, f, s0):
        x = m.slotattn.mlp(m.slotattn.layer_norm(f))
        return m.slotattn.slot_attention(x, s0)

    got_slots, got_attn = ocr.spec.module.apply(
        {"params": ocr.params}, feats, slots0, method=flax_route)
    np.testing.assert_allclose(np.asarray(got_slots), ref_slots.numpy(), atol=TOL)
    np.testing.assert_allclose(np.asarray(got_attn), ref_attn.numpy(), atol=TOL)


@needs_reference
def test_teacher_forced_ce_parity(pair):
    """Same slots + same target tokens -> same cross-entropy loss (<=1e-4),
    mirroring reference slate_module.py:140-157 with dropout off."""
    import torch

    tm, ocr, cfg = pair
    rng = np.random.default_rng(4)
    V = cfg.ocr.dvae.vocab_size
    slots = rng.standard_normal(
        (2, cfg.ocr.slotattr.num_slots, cfg.ocr.slotattr.slot_size)).astype(np.float32)
    token_ids = rng.integers(0, V, size=(2, 256))
    z_hard = torch.from_numpy(np.eye(V, dtype=np.float32)[token_ids])  # [B,T,V]
    with torch.no_grad():
        slots_t = torch.from_numpy(slots)
        z_emb = tm._dict(z_hard)
        z_emb = torch.cat([tm._bos_token().expand(2, -1, -1), z_emb], dim=1)
        z_emb = tm._z_pos(z_emb)
        pred = tm._out(tm._tfdec(z_emb[:, :-1], tm._slotproj(slots_t)))
        ref_ce = float(-(z_hard * torch.log_softmax(pred, dim=-1))
                       .flatten(start_dim=1).sum(-1).mean())
    got_ce = float(ocr.spec.module.apply(
        {"params": ocr.params}, slots, np.asarray(token_ids),
        method=lambda m, s, t: m._teacher_forced_ce(s, t, False)))
    assert got_ce == pytest.approx(ref_ce, abs=TOL)


@needs_reference
def test_load_reference_checkpoint_roundtrip(pair, tmp_path):
    """A reference-format .pth on disk loads via load_reference_checkpoint."""
    import torch

    tm, _, cfg = pair
    ckpt = {"step": 123, "epoch": 4, "best_val_loss": 0.5,
            "ocr_module_state_dict": tm.state_dict()}
    path = tmp_path / "model_latest.pth"
    torch.save(ckpt, path)
    ocr2 = create_ocr(cfg.ocr, cfg.dataset, seed=7)
    meta = load_reference_checkpoint(path, ocr2)
    assert meta == {"step": 123, "epoch": 4, "best_val_loss": 0.5}
    np.testing.assert_allclose(
        np.asarray(ocr2.params["out"]["kernel"]),
        tm.state_dict()["_out.weight"].numpy().T)
