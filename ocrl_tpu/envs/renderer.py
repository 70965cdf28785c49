"""Anti-aliased 2D sprite renderer (replaces the spriteworld dependency).

The reference renders observations with spriteworld's PILRenderer at 10x
supersampling (reference: envs/synthetic_envs/base.py:32-35).  spriteworld is
not available here, so this is a self-contained implementation with the same
interface shape: sprites with (x, y, shape, scale, rgb colour) drawn onto a
square canvas, y-axis pointing up, optional background image.

Shapes supported match the reference's vocabulary
(envs/synthetic_envs/base.py:13): square, triangle, star_4, circle, pentagon,
hexagon, octagon, star_5, star_6, spoke_4, spoke_5, spoke_6.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np
from PIL import Image, ImageDraw

SHAPES = [
    "square", "triangle", "star_4", "circle", "pentagon", "hexagon",
    "octagon", "star_5", "star_6", "spoke_4", "spoke_5", "spoke_6",
]


@dataclass
class Sprite:
    x: float
    y: float
    shape: str
    scale: float
    rgb: tuple[int, int, int]


def _regular_polygon(n: int, phase: float = 0.0) -> np.ndarray:
    angles = 2 * math.pi * np.arange(n) / n + phase
    return np.stack([np.cos(angles), np.sin(angles)], axis=1)


def _star(n: int, inner: float = 0.5, phase: float = math.pi / 2) -> np.ndarray:
    angles = math.pi * np.arange(2 * n) / n + phase
    radii = np.where(np.arange(2 * n) % 2 == 0, 1.0, inner)
    return np.stack([radii * np.cos(angles), radii * np.sin(angles)], axis=1)


def shape_vertices(shape: str) -> np.ndarray:
    """Unit-circumradius vertex list for a named shape, centred at origin."""
    if shape == "square":
        return _regular_polygon(4, phase=math.pi / 4)
    if shape == "triangle":
        return _regular_polygon(3, phase=math.pi / 2)
    if shape == "circle":
        return _regular_polygon(40)
    if shape == "pentagon":
        return _regular_polygon(5, phase=math.pi / 2)
    if shape == "hexagon":
        return _regular_polygon(6)
    if shape == "octagon":
        return _regular_polygon(8, phase=math.pi / 8)
    if shape.startswith("star_"):
        return _star(int(shape.split("_")[1]), inner=0.5)
    if shape.startswith("spoke_"):
        return _star(int(shape.split("_")[1]), inner=0.18)
    raise ValueError(f"Unknown shape '{shape}' (choose from {SHAPES})")


_VERTEX_CACHE: dict[str, np.ndarray] = {}


class SpriteRenderer:
    """Renders sprites onto an `image_size` canvas with supersampled AA.

    Uses the native C++ scanline rasterizer (ocrl_tpu/native) when available
    (~25x faster than PIL — rendering dominates dataset collection); set
    ``use_native=False`` to force the PIL path.
    """

    def __init__(self, image_size: tuple[int, int] = (64, 64), anti_aliasing: int = 10,
                 bg_color: tuple[int, int, int] = (0, 0, 0),
                 use_native: bool = True):
        self._size = image_size
        self._aa = anti_aliasing
        self._bg_color = bg_color
        self._canvas_bg: Optional[Image.Image] = None  # optional background image
        if use_native:
            from ocrl_tpu import native

            self._native = native if native.available() else None
        else:
            self._native = None

    def set_background(self, img: Optional[Image.Image]) -> None:
        self._canvas_bg = img
        self._bg_array = None
        if img is not None:
            self._bg_array = np.asarray(
                img.resize(self._size).convert("RGB"), np.uint8)

    def _render_native(self, sprites: Sequence[Sprite]) -> np.ndarray:
        W, H = self._size
        ss_w, ss_h = W * self._aa, H * self._aa
        polys, colors = [], []
        for sprite in sprites:
            verts = _VERTEX_CACHE.get(sprite.shape)
            if verts is None:
                verts = shape_vertices(sprite.shape)
                _VERTEX_CACHE[sprite.shape] = verts
            r = sprite.scale / 2.0
            xs = (sprite.x + r * verts[:, 0]) * ss_w
            ys = (1.0 - (sprite.y + r * verts[:, 1])) * ss_h
            polys.append(np.stack([xs, ys], axis=1))
            colors.append(sprite.rgb)
        colors = np.asarray(colors, np.uint8).reshape(-1, 3)
        bg = getattr(self, "_bg_array", None) if self._canvas_bg is not None else None
        return self._native.render_polygons(W, H, self._aa, polys, colors, bg)

    def render(self, sprites: Sequence[Sprite]) -> np.ndarray:
        if self._native is not None:
            return self._render_native(sprites)
        return self._render_pil(sprites)

    def _render_pil(self, sprites: Sequence[Sprite]) -> np.ndarray:
        W, H = self._size
        ss_w, ss_h = W * self._aa, H * self._aa
        if self._canvas_bg is not None:
            canvas = self._canvas_bg.resize((ss_w, ss_h)).convert("RGB")
        else:
            canvas = Image.new("RGB", (ss_w, ss_h), self._bg_color)
        draw = ImageDraw.Draw(canvas)
        for sprite in sprites:
            verts = _VERTEX_CACHE.get(sprite.shape)
            if verts is None:
                verts = shape_vertices(sprite.shape)
                _VERTEX_CACHE[sprite.shape] = verts
            # circumradius = scale/2 so the sprite's footprint matches the
            # collision radius used by the envs (base env uses scale/2).
            r = sprite.scale / 2.0
            xs = (sprite.x + r * verts[:, 0]) * ss_w
            ys = (1.0 - (sprite.y + r * verts[:, 1])) * ss_h  # y-axis up
            draw.polygon(list(zip(xs.tolist(), ys.tolist())), fill=tuple(sprite.rgb))
        if self._aa != 1:
            canvas = canvas.resize((W, H), Image.LANCZOS)
        return np.asarray(canvas, dtype=np.uint8)
