"""Multi-shape layer compositing (the viewer's draw/draw_rgb path).

The reference viewer renders each drawn shape as a color layer and
composites them in draw order with OVER blending (demos/viewer/src/
script.rs:101-137, draw2d.rs:93-95). Here each layer goes through the
full tiled MPR pipeline and the composite is one numpy pass.
"""

from __future__ import annotations

import numpy as np

from .region import ImageSize
from .render2d import PixelRenderer

WHITE = (1.0, 1.0, 1.0)


def render_layers(
    shapes: list,
    size: ImageSize,
    *,
    colors: list | None = None,
    world_to_model: np.ndarray | None = None,
    z: float = 0.0,
    background=(0.0, 0.0, 0.0),
    interpret: bool | None = None,
) -> np.ndarray:
    """Renders shapes as color layers, later shapes over earlier ones.

    colors: per-shape (r, g, b) in [0, 1]; None entries (and a None
    list) draw white, matching the plain `draw()` call. Returns u8
    [H, W, 3].
    """
    H, W = size.height, size.width
    out = np.empty((H, W, 3), np.float32)
    out[:] = np.asarray(background, np.float32)
    n = len(shapes)
    colors = list(colors) if colors is not None else [None] * n
    for shape, color in zip(shapes, colors):
        from ..core.tree import Tree
        from ..shape import Shape

        if isinstance(shape, Tree):
            shape = Shape.from_tree(shape)
        # single-level 64px: the bucketed tape-as-data path —
        # one compiled pipeline shared across all layers/shapes
        r = PixelRenderer(shape, size, tile_size=64, interpret=interpret)
        inside = r.render(world_to_model, z=z).inside()
        c = np.clip(np.asarray(color if color is not None else WHITE,
                               np.float32), 0.0, 1.0)
        out = np.where(inside[..., None], c, out)
    return (out * 255.0).astype(np.uint8)
