"""Hydra-compatible configuration system (no external deps).

The reference (ugadiarov-la-phystech-edu/OCRL) composes configs with Hydra 1.x +
OmegaConf (reference: train_ocr.py:18, configs/train_ocr.yaml:1-7).  This module
re-implements the subset of that surface the framework needs, so entry points keep
the exact CLI:

    python train_ocr.py ocr=slate dataset=random-N5C4S4S2 ocr.slotattr.num_slots=6

Supported:
  * config groups (``configs/ocr/slate.yaml`` selected via ``ocr=slate``)
  * ``defaults`` lists with ``_base`` / ``_self_`` ordering and mandatory ``???``
  * dotted CLI overrides (``a.b.c=1``), ``+new.key=v`` additions
  * ``${a.b}`` interpolation and ``${now:%fmt}`` resolver
  * attribute-style access (``cfg.ocr.name``) like OmegaConf DictConfig
"""

from .node import Config, MissingMandatoryValue, MISSING
from .compose import compose, parse_overrides, main

__all__ = [
    "Config",
    "MissingMandatoryValue",
    "MISSING",
    "compose",
    "parse_overrides",
    "main",
]
