"""Render support types: cancellation, tile sizes, hints.

Analogs of fidget-core/src/render/{mod,config}.rs. In the reference,
`CancelToken` is polled per-tile by rayon workers (config.rs:38-80) and
`TileSizes` drives per-tile recursion (mod.rs:181-236). Here a frame is
a single XLA dispatch, so cancellation is polled *between* dispatches
(levels, strata, retries) by the host-side drivers, and tile sizes
configure the level structure of the batched pipelines.
"""

from __future__ import annotations

import threading


class RenderCancelled(Exception):
    """Raised by renderers/meshers when their CancelToken fires.

    The reference returns `None` from cancelled renders
    (fidget-raster/src/lib.rs:141-162); an exception is the Python
    idiom for the same "no result, caller asked us to stop" contract.
    """


class CancelToken:
    """Cooperative cancellation flag (render/config.rs:38-80).

    Thread-safe; `cancel()` may be called from any thread. Polled
    between device dispatches by every long-running host loop:
    `PixelRenderer.render` (before the frame dispatch),
    `VoxelRenderer.render` (before each capacity-retry dispatch),
    `build_mesh` (between octree levels, before each eval stage, and
    between collapse size-rounds), and the viewer's watch loop. A
    fired token makes those entry points raise `RenderCancelled`.
    """

    def __init__(self):
        self._ev = threading.Event()

    def cancel(self) -> None:
        self._ev.set()

    def is_cancelled(self) -> bool:
        return self._ev.is_set()

    # raw-pointer sharing in the reference crosses wasm workers
    # (config.rs:57-80); the Python analog is just passing the object.


def check_cancel(cancel: "CancelToken | None") -> None:
    """Raises RenderCancelled if `cancel` is set and fired."""
    if cancel is not None and cancel.is_cancelled():
        raise RenderCancelled()


class TileSizes(list):
    """Strictly-descending, divisible tile-size list (render/mod.rs:181-236)."""

    def __init__(self, sizes):
        sizes = [int(s) for s in sizes]
        if not sizes:
            raise ValueError("tile sizes must not be empty")
        for a, b in zip(sizes, sizes[1:]):
            if b >= a:
                raise ValueError("tile sizes must be strictly descending")
            if a % b:
                raise ValueError("each tile size must divide the previous")
        super().__init__(sizes)

    def last(self) -> int:
        return self[-1]


class RenderHints:
    """Backend tuning hints (render/mod.rs:258-274). The TPU pipeline's
    defaults mirror the JIT hints (64-root 3D, 64-root 2D) rather than
    the VM's deeper lists — levels are device launches here, and fewer,
    wider levels win."""

    @staticmethod
    def tile_sizes_2d() -> TileSizes:
        return TileSizes([64])

    @staticmethod
    def tile_sizes_3d() -> TileSizes:
        return TileSizes([64, 16])

    @staticmethod
    def simplify_tree_during_meshing(depth: int) -> bool:
        # the mesher currently evaluates with the root tape (see
        # fidget_tpu.mesh); reserved for level-wise simplification
        return False
