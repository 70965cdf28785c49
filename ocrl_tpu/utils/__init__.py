"""Run infrastructure: logging, metrics, viz, checkpointing, naming."""

from . import logger
from .logger import init_wandb, Image
from .metrics import adjusted_rand_index, calculate_ari, hungarian_matching
from .viz import for_viz, visualize, img_to_slot, slot_to_img
from .checkpoint import save, load, save_checkpoint, load_checkpoint
from .sharded_checkpoint import save_sharded, load_sharded


def get_log_prefix(config) -> str:
    """Run-name builder (reference: utils/tools.py:55-76)."""
    ocr = config.ocr
    if ocr.name == "VAE":
        prefix = f"{ocr.name}N{ocr.cnn_feat_size ** 2}" if ocr.use_cnn_feat else ocr.name
    elif ocr.name in ("SlotAttn", "SLATE"):
        prefix = f"{ocr.name}N{ocr.slotattr.num_slots}"
    else:
        prefix = ocr.name
    if "pooling" in config:
        pooling = config.pooling
        if pooling.ocr_checkpoint.run_id != "" or pooling.ocr_checkpoint.get("local_file"):
            prefix = "Pretrained-" + prefix
        if pooling.learn_aux_loss:
            prefix += "Aux"
        if pooling.learn_downstream_loss:
            prefix += "FineTune"
        prefix += f"-{pooling.name}"
    return prefix


__all__ = [
    "logger",
    "init_wandb",
    "Image",
    "adjusted_rand_index",
    "calculate_ari",
    "hungarian_matching",
    "for_viz",
    "visualize",
    "img_to_slot",
    "slot_to_img",
    "save",
    "load",
    "save_checkpoint",
    "load_checkpoint",
    "save_sharded",
    "load_sharded",
    "get_log_prefix",
]
