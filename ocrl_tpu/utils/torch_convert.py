"""Reference-checkpoint (torch .pth) -> flax parameter conversion.

The reference saves ``{"step", "epoch", "best_val_loss",
"ocr_module_state_dict": <torch state_dict>, ...}`` via torch.save
(reference: utils/tools.py:263-289, ocrs/base.py:76-88).  This module maps
those state_dicts onto the flax parameter trees built by ocrl_tpu.models so
reference-trained encoders can be evaluated (ARI/MSE, RL probes) directly in
this framework — SURVEY §7 "checkpoint compatibility".

Layout conventions translated:
  * torch Linear ``weight`` [out, in]      -> flax ``kernel`` [in, out]
  * torch Conv2d ``weight`` [O, I, kh, kw] -> flax ``kernel`` [kh, kw, I, O]
    (NCHW -> NHWC framework layout)
  * torch LayerNorm ``weight``             -> flax ``scale``
  * torch GRUCell ``weight_ih/hh`` [3H, D] -> FusedGRUCell ``wi/wh`` [D, 3H]
    (same r|z|n gate-block order, models/common.py:143-168)
  * torch Embedding ``weight``             -> flax ``embedding`` (as-is)

Non-parameter torch buffers (causal masks, fixed position grids) have no
flax-side parameters — they are recomputed — and are skipped.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import numpy as np

__all__ = ["convert_ocr_state_dict", "load_reference_checkpoint"]


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x,
                      np.float32)


def _linear(x):
    return _t(x).T


def _conv(x):
    return _t(x).transpose(2, 3, 1, 0)


def _ident(x):
    return _t(x)


def _slate_key(path: tuple[str, ...]) -> tuple[str, Callable] | None:
    """flax param path -> (torch state_dict key, value transform) for
    SLATE/Slot-Attention (reference module tree: ocrs/slate/slate_module.py,
    ocrs/common/models.py, slot_attn.py, transformer.py)."""
    p = list(path)
    leaf = p[-1]

    def conv_block(torch_prefix: str) -> tuple[str, Callable]:
        # flax Conv2dBlock/Conv_0.{kernel,bias} <- torch <prefix>.m.{weight,bias}
        name = "weight" if leaf == "kernel" else "bias"
        tf = _conv if leaf == "kernel" else _ident
        return f"{torch_prefix}.m.{name}", tf

    # ---- dVAE ----------------------------------------------------------------
    if p[0] == "dvae":
        if p[1] == "encoder":
            i = int(p[2].split("_")[1])
            if len(p) == 5:  # layers_i/Conv_0/{kernel,bias} (Conv2dBlock)
                return conv_block(f"_dvae._encoder.{i}")
            # layers_7: bare conv2d, no .m wrapper
            name = "weight" if leaf == "kernel" else "bias"
            return f"_dvae._encoder.{i}.{name}", (_conv if leaf == "kernel" else _ident)
        if p[1].startswith("decoder_blocks_"):
            i = int(p[1].split("_")[2])
            ti = i if i < 5 else i + 1  # torch index 5/10 are PixelShuffle
            return conv_block(f"_dvae._decoder.{ti}")
        if p[1] == "decoder_out":
            name = "weight" if leaf == "kernel" else "bias"
            return f"_dvae._decoder.11.{name}", (_conv if leaf == "kernel" else _ident)

    # ---- CNN encoder + positional embedding -----------------------------------
    if p[0] == "enc":
        if p[1].startswith("Conv2dBlock_"):
            i = int(p[1].split("_")[1])
            return conv_block(f"_enc._encoder.{i}")
        if p[1] == "Conv_0":
            name = "weight" if leaf == "kernel" else "bias"
            return f"_enc._encoder.3.{name}", (_conv if leaf == "kernel" else _ident)
    if p[0] == "enc_pos" and p[1] == "channels_map":
        name = "weight" if leaf == "kernel" else "bias"
        return f"_enc_pos.channels_map.{name}", (_conv if leaf == "kernel" else _ident)

    # ---- slot attention --------------------------------------------------------
    if p[0] == "slotattn":
        prefix = "_slotattn"
        rest = p[1:]
        if rest == ["slot_mu"]:
            return f"{prefix}.slot_mu", _ident
        if rest == ["slot_log_sigma"]:
            return f"{prefix}.slot_log_sigma", _ident
        # mlp/layers_{0,2} -> mlp.{0,2}; other segment names match 1:1
        tk = ".".join(r.replace("layers_", "") for r in rest[:-1])
        if "gru" in rest:
            m = {"wi": ("weight_ih", _linear), "wh": ("weight_hh", _linear),
                 "bi": ("bias_ih", _ident), "bh": ("bias_hh", _ident)}[leaf]
            return f"{prefix}.{tk}.{m[0]}", m[1]
        if leaf == "scale":
            return f"{prefix}.{tk}.weight", _ident
        if leaf == "bias":
            return f"{prefix}.{tk}.bias", _ident
        if leaf == "kernel":
            return f"{prefix}.{tk}.weight", _linear

    # ---- broadcast decoder (Slot-Attention / use_bcdec) ------------------------
    if p[0] == "bcdec":
        if p[1] == "blocks":
            i = int(p[2].split("_")[1])
            if len(p) == 5:  # Conv2dBlock
                return conv_block(f"_dec._decoder.{i}")
            name = "weight" if leaf == "kernel" else "bias"
            return f"_dec._decoder.{i}.{name}", (_conv if leaf == "kernel" else _ident)
        if p[1] == "pos_emb":
            name = "weight" if leaf == "kernel" else "bias"
            return f"_dec._pos_emb.channels_map.{name}", \
                (_conv if leaf == "kernel" else _ident)

    # ---- transformer decoder head ----------------------------------------------
    if p[0] == "slotproj":
        return "_slotproj.weight", _linear
    if p[0] == "dictionary":
        return "_dict.dictionary.weight", _ident
    if p[0] == "bos":
        return "_bos_token._bos_token", _ident
    if p[0] == "z_pos":
        return "_z_pos.pe", _ident
    if p[0] == "out":
        return "_out.weight", _linear
    if p[0] == "tfdec":
        if p[1] == "layer_norm":
            name = "weight" if leaf == "scale" else "bias"
            return f"_tfdec.layer_norm.{name}", _ident
        i = int(p[1].split("_")[1])
        sub = p[2]
        if sub in ("self_attn", "encoder_decoder_attn"):
            return f"_tfdec.blocks.{i}.{sub}.{p[3]}.weight", _linear
        if sub in ("self_attn_layer_norm", "encoder_decoder_attn_layer_norm",
                   "ffn_layer_norm"):
            name = "weight" if leaf == "scale" else "bias"
            return f"_tfdec.blocks.{i}.{sub}.{name}", _ident
        if sub == "ffn":
            j = {"Dense_0": 0, "Dense_1": 2}[p[3]]
            name = "weight" if leaf == "kernel" else "bias"
            tf = _linear if leaf == "kernel" else _ident
            return f"_tfdec.blocks.{i}.ffn.{j}.{name}", tf

    return None


_KEY_MAPS: dict[str, Callable] = {"SLATE": _slate_key}


def convert_ocr_state_dict(state_dict: dict, params_template,
                           model_name: str = "SLATE"):
    """Map a reference torch ``ocr_module_state_dict`` onto ``params_template``
    (a flax param tree of the same architecture). Raises KeyError if a flax
    parameter has no torch counterpart, ValueError on shape mismatch."""
    key_fn = _KEY_MAPS.get(model_name)
    if key_fn is None:
        raise NotImplementedError(
            f"torch->flax conversion implemented for {sorted(_KEY_MAPS)}, "
            f"not {model_name!r}")

    def convert_leaf(path, leaf):
        segs = tuple(str(getattr(s, "key", s)) for s in path)
        mapped = key_fn(list(segs))
        if mapped is None:
            raise KeyError(f"no torch mapping for flax param {'/'.join(segs)}")
        tkey, tf = mapped
        if tkey not in state_dict:
            raise KeyError(f"{tkey} (for {'/'.join(segs)}) missing from "
                           "torch state_dict")
        arr = tf(state_dict[tkey])
        if tuple(arr.shape) != tuple(leaf.shape):
            raise ValueError(
                f"shape mismatch for {'/'.join(segs)} <- {tkey}: "
                f"{arr.shape} vs {leaf.shape}")
        return arr.astype(np.asarray(leaf).dtype)

    return jax.tree_util.tree_map_with_path(convert_leaf, params_template)


def load_reference_checkpoint(path, ocr) -> dict[str, Any]:
    """Load a reference-format .pth checkpoint into an OCR wrapper in place.

    Returns the bookkeeping fields ({step, epoch, best_val_loss} when present).
    Optimizer state is NOT converted — torch Adam moments don't transfer to
    optax multi_transform trees; resumed fine-tuning restarts the optimizer.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt["ocr_module_state_dict"]
    ocr.params = convert_ocr_state_dict(state_dict, ocr.params, ocr.name)
    return {k: ckpt[k] for k in ("step", "epoch", "best_val_loss") if k in ckpt}
