"""Sample-grid visualisation helpers (NHWC throughout).

Work-alikes of the reference's image helpers (reference: utils/tools.py:203-219
for_viz/visualize), adapted to the framework's NHWC layout.
"""

from __future__ import annotations

import numpy as np


def for_viz(x) -> np.ndarray:
    """[B,H,W,C] float in [0,1] -> uint8 numpy (reference: utils/tools.py:203)."""
    x = np.asarray(x)
    return (np.clip(x, 0.0, 1.0) * 255.0).astype(np.uint8)


def visualize(images) -> np.ndarray:
    """Concatenate per-model visualisations along width.

    Each entry is [B,H,W,C] or [B,K,H,W,C]; 5-D entries are unbound over K.
    Mirrors reference utils/tools.py:209-219 (NCHW there, NHWC here).
    """
    cols = []
    for img in images:
        img = np.asarray(img)
        if img.ndim == 4:
            cols.append(img)
        else:  # [B,K,H,W,C]
            cols.extend(np.moveaxis(img, 1, 0))
    return np.concatenate(cols, axis=-2)  # along width


def img_to_slot(x) -> np.ndarray:
    """[B,H,W,D] -> [B,H*W,D] (reference: utils/tools.py:29, NHWC here)."""
    B, H, W, D = x.shape
    return x.reshape(B, H * W, D)


def slot_to_img(slot):
    """[B,N,D] -> [B,sqrt(N),sqrt(N),D] (reference: utils/tools.py:33-36)."""
    B, N, D = slot.shape
    size = int(round(N ** 0.5))
    return slot.reshape(B, size, size, D)
