"""Level-synchronous 2D MPR rasterizer.

The TPU redesign of the reference's recursive tile renderer
(fidget-raster/src/pixel.rs:313-437): instead of per-tile recursion
with thread-local evaluators, the whole frame advances as dense,
batched levels — the execution model of the wgpu pipeline
(fidget-wgpu/src/voxel/mod.rs:2557-2596) expressed in JAX:

1. **Root interval pass** — one Pallas interval-kernel launch where the
   *lanes* are the root tiles; produces per-tile output intervals plus
   packed 2-bit choice traces.
2. **Classification** — tiles prove inside / outside (fills) or stay
   active; `pixel_perfect` mode skips fills entirely, which is the
   differentiable path.
3. **Batched simplification** — `DeviceSimplifier` specializes the
   tape per tile in one `lax.scan` over the parent tape.
4. **Leaf pass** — one Pallas float-kernel launch, one grid instance
   per tile, each evaluating its own simplified tape over the tile's
   pixels. Culled tiles get their tape length zeroed, so their
   instances cost nothing — the static-shape analog of "skip the
   tile".
5. **Assembly** — distances scatter into the image; fills overwrite.

Everything from (1) to (5) is traced into a single XLA computation, so
a frame is one device dispatch.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..compiler.lower import lower
from ..compiler.pack import pack_tapes
from ..compiler.tape import Tape
from ..core.var import Var
from ..eval.arith import FloatMode, IntervalMode
from ..eval.pallas_interp import (
    default_interpret,
    interp_float,
    interp_float_coded,
    interp_interval,
)
from ..eval.simplify_device import DeviceSimplifier
from ..eval.unrolled import eval_tape
from ..shape import Shape, ShapeVars
from .region import ImageSize, compose2, mat3_to_mat4

#: fill codes in the `fill` channel of a rendered image
FILL_NONE = 0
FILL_INSIDE = 1
FILL_OUTSIDE = 2


@dataclass
class Image2D:
    """Output of the 2D renderer.

    distance: f32 [H, W] — signed distance where evaluated (garbage in
      filled regions; consult `fill`).
    fill: int8 [H, W] — FILL_NONE where `distance` is valid, else
      FILL_INSIDE/FILL_OUTSIDE from interval proofs.
    """

    distance: np.ndarray
    fill: np.ndarray

    def inside(self) -> np.ndarray:
        """Boolean occupancy (the reference's "mono" mode)."""
        return np.where(
            self.fill == FILL_NONE, self.distance < 0, self.fill == FILL_INSIDE
        )


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


class PixelRenderer:
    """Compiled 2D renderer for one tape at one image size.

    Args:
      tape: the shape's register tape (single output).
      image_size: output size in pixels.
      tile_size: root tile edge (pixels); must divide 128*8 layouts
        cleanly — 64 is the tuned default (two levels: 64 -> pixels,
        matching the VM hints' spirit, fidget-core/src/vm/mod.rs:255).
      interpret: force Pallas interpret mode (None = auto by platform).
    """

    def __init__(
        self,
        tape: Tape | Shape,
        image_size: ImageSize,
        *,
        tile_size: int = 64,
        interpret: bool | None = None,
    ):
        self.shape_transform = None
        if isinstance(tape, Shape):
            self.shape_transform = tape.transform
            tape = tape.tape()
        assert tape.output_count == 1, "2D rendering expects a single output"
        self.tape = tape
        self.size = image_size
        self.ts = tile_size
        self.interpret = default_interpret() if interpret is None else interpret

        self.W = image_size.width
        self.H = image_size.height
        self.ntx = -(-self.W // tile_size)
        self.nty = -(-self.H // tile_size)
        self.n_tiles = self.ntx * self.nty
        # root-pass lane layout: tiles padded to a full (S0, 128) plane
        self.root_s0 = max(8, _ceil_to(-(-self.n_tiles // 128), 8))
        # leaf lane layout: tile pixels as (ts*ts/128, 128)
        assert (tile_size * tile_size) % 128 == 0
        self.leaf_s0 = (tile_size * tile_size) // 128

        self.packed = pack_tapes([tape])
        self.simplifier = DeviceSimplifier(tape)
        self.nf = self.simplifier.nf
        self.n_inputs = len(tape.var_map)
        self.c_words = max(1, -(-tape.choice_count // 16))

        # input index of each spatial axis (None if the tape ignores it)
        self.axis_of = {}
        for v, i in tape.var_map.items():
            self.axis_of[v.kind] = i

        # static screen coordinates
        tx = np.arange(self.ntx) * tile_size
        ty = np.arange(self.nty) * tile_size
        self.tile_x0, self.tile_y0 = [
            g.reshape(-1).astype(np.float32) for g in np.meshgrid(tx, ty)
        ]
        self._frame = jax.jit(self._frame_impl, static_argnames=("pixel_perfect",))

    # ------------------------------------------------------------------

    def _transform_points(self, mat, xs, ys, z):
        """Applies the homogeneous (px, py, z, 1) -> model 4x4 to float
        planes, returning model (x, y, z)."""

        def row(r):
            return mat[r, 0] * xs + mat[r, 1] * ys + mat[r, 2] * z + mat[r, 3]

        w = row(3)
        return row(0) / w, row(1) / w, row(2) / w

    def _transform_intervals(self, im, mat, xi, yi, z):
        """Interval version of the homogeneous transform. The w row is
        divided through interval division, which is exact for affine
        matrices (w == [1, 1]) and correctly widens for perspective."""
        from ..compiler.tape import TapeOp

        def axis(r):
            mx = im.binary(TapeOp.MUL, xi, (mat[r, 0], mat[r, 0]))
            my = im.binary(TapeOp.MUL, yi, (mat[r, 1], mat[r, 1]))
            s = im.binary(TapeOp.ADD, mx, my)
            c = mat[r, 2] * z + mat[r, 3]
            return im.binary(TapeOp.ADD, s, (c, c))

        wr = axis(3)
        return tuple(
            im.binary(TapeOp.DIV, axis(r), wr) for r in range(3)
        )

    def _frame_impl(self, mat, z, var_vec, *, pixel_perfect: bool):
        ts, W, H = self.ts, self.W, self.H
        T = self.n_tiles
        im = IntervalMode(jnp)
        interpret = self.interpret

        # ---- stage 1: root interval pass (lanes = tiles) --------------
        lanes = self.root_s0 * 128
        x0 = jnp.zeros(lanes, jnp.float32).at[:T].set(self.tile_x0)
        y0 = jnp.zeros(lanes, jnp.float32).at[:T].set(self.tile_y0)
        xi = (x0, x0 + ts)
        yi = (y0, y0 + ts)
        mxi, myi, mzi = self._transform_intervals(im, mat, xi, yi, z)

        V = self.n_inputs
        var_lo = jnp.broadcast_to(
            var_vec[None, :, None, None], (1, V, self.root_s0, 128)
        ).astype(jnp.float32)
        var_hi = var_lo
        for kind, ivl in (("x", mxi), ("y", myi), ("z", mzi)):
            idx = self.axis_of.get(kind)
            if idx is not None:
                var_lo = var_lo.at[0, idx].set(ivl[0].reshape(self.root_s0, 128))
                var_hi = var_hi.at[0, idx].set(ivl[1].reshape(self.root_s0, 128))

        olo, ohi, packed_choices = interp_interval(
            self.packed.w1, self.packed.w2, self.packed.imm,
            self.packed.lengths, var_lo, var_hi,
            nf=self.nf, n_inputs=V, n_outputs=1, s0=self.root_s0,
            c_words=self.c_words, interpret=interpret,
        )
        tile_lo = olo[0, 0].reshape(-1)[:T]
        tile_hi = ohi[0, 0].reshape(-1)[:T]

        # ---- stage 2: classify ----------------------------------------
        inside = tile_hi < 0.0
        outside = tile_lo > 0.0
        active = ~(inside | outside)
        if pixel_perfect:
            active = jnp.ones_like(active)

        # ---- stage 3: per-tile simplification ---------------------------
        # packed choice words -> Pallas liveness kernel -> sort-compacted
        # per-tile child tapes, all on device
        w1, w2, imm, lengths, _ncho = self.simplifier.simplify_packed(
            packed_choices, n_tiles=T, interpret=interpret
        )

        # ---- stage 4: leaf pass (one instance per tile) -----------------
        # zero out culled tiles' tapes: their instances do no work
        lengths = jnp.where(active, lengths, 0)
        # per-tile pixel coordinates (row-major within the tile)
        ii = jnp.arange(ts, dtype=jnp.float32)
        px = self.tile_x0[:, None, None] + ii[None, None, :]
        py = self.tile_y0[:, None, None] + ii[None, :, None]
        px = jnp.broadcast_to(px, (T, ts, ts)).reshape(T, self.leaf_s0, 128)
        py = jnp.broadcast_to(py, (T, ts, ts)).reshape(T, self.leaf_s0, 128)
        mx, my, mz = self._transform_points(mat, px, py, z)
        vars_ = jnp.broadcast_to(
            var_vec[None, :, None, None], (T, V, self.leaf_s0, 128)
        ).astype(jnp.float32)
        for kind, plane in (("x", mx), ("y", my), ("z", mz)):
            idx2 = self.axis_of.get(kind)
            if idx2 is not None:
                vars_ = vars_.at[:, idx2].set(plane)

        dist = interp_float(
            w1, w2, imm, lengths, vars_,
            nf=self.nf, n_inputs=V, n_outputs=1, s0=self.leaf_s0,
            interpret=interpret,
        )[:, 0]  # [T, leaf_s0, 128]

        # ---- stage 5: assemble ------------------------------------------
        dist = dist.reshape(self.nty, self.ntx, ts, ts)
        img = dist.transpose(0, 2, 1, 3).reshape(self.nty * ts, self.ntx * ts)
        fill_tile = jnp.where(
            active,
            np.int8(FILL_NONE),
            jnp.where(inside, np.int8(FILL_INSIDE), np.int8(FILL_OUTSIDE)),
        ).astype(jnp.int8)
        fill = jnp.repeat(jnp.repeat(
            fill_tile.reshape(self.nty, self.ntx), ts, axis=0), ts, axis=1)
        return img[:H, :W], fill[:H, :W]

    # ------------------------------------------------------------------

    def _mat4(self, world_to_model: np.ndarray | None) -> np.ndarray:
        """Combined (px, py, z, 1) -> model 4x4: screen->world 3x3,
        optional world->model view, then the shape's own transform."""
        m = mat3_to_mat4(compose2(world_to_model, self.size))
        if self.shape_transform is not None:
            m = self.shape_transform @ m
        return m.astype(np.float32)

    def _var_vec(self, vars) -> np.ndarray:
        """Dense per-input value vector from ShapeVars (axes are filled
        by the transform stages and ignored here)."""
        vec = np.zeros(self.n_inputs, np.float32)
        if vars is not None:
            for v, val in vars.items():
                idx = self.tape.var_map.get(v)
                if idx is not None:
                    vec[idx] = np.float32(val)
        missing = [
            v
            for v in self.tape.var_map
            if v.kind == "v" and (vars is None or v not in vars)
        ]
        if missing:
            raise ValueError(f"unbound shape variables: {missing}")
        return vec

    def render(
        self,
        world_to_model: np.ndarray | None = None,
        *,
        z: float = 0.0,
        vars: "ShapeVars | dict | None" = None,
        pixel_perfect: bool = False,
    ) -> Image2D:
        """Renders a frame; one device dispatch."""
        mat = jnp.asarray(self._mat4(world_to_model))
        vec = jnp.asarray(self._var_vec(vars))
        img, fill = self._frame(
            mat, jnp.float32(z), vec, pixel_perfect=pixel_perfect
        )
        return Image2D(np.asarray(img), np.asarray(fill))

    def render_brute(
        self,
        world_to_model: np.ndarray | None = None,
        *,
        z: float = 0.0,
        vars: "ShapeVars | dict | None" = None,
    ) -> np.ndarray:
        """Dense per-pixel evaluation via the unrolled evaluator — the
        ground-truth oracle for the tiled pipeline (and the reference's
        `RenderMode::Brute`)."""
        mat = self._mat4(world_to_model)
        vec = self._var_vec(vars)
        cols = np.arange(self.W, dtype=np.float32)
        rows = np.arange(self.H, dtype=np.float32)
        px, py = np.meshgrid(cols, rows)
        mx, my, mz = self._transform_points(mat, px, py, np.float32(z))
        fm = FloatMode(np)
        inputs = [
            np.broadcast_to(v, px.shape).astype(np.float32) for v in vec
        ]
        for kind, plane in (("x", mx), ("y", my), ("z", mz)):
            idx = self.axis_of.get(kind)
            if idx is not None:
                inputs[idx] = np.broadcast_to(plane, px.shape).astype(
                    np.float32
                )
        with np.errstate(all="ignore"):
            (d,), _ = eval_tape(self.tape, fm, inputs)
        return d


def render(
    tape: Tape | Shape,
    image_size: ImageSize,
    *,
    world_to_model: np.ndarray | None = None,
    z: float = 0.0,
    vars: ShapeVars | dict | None = None,
    tile_size: int = 64,
    pixel_perfect: bool = False,
    interpret: bool | None = None,
) -> Image2D:
    """One-shot 2D render (mirrors fidget_raster::pixel::render)."""
    r = PixelRenderer(tape, image_size, tile_size=tile_size, interpret=interpret)
    return r.render(
        world_to_model, z=z, vars=vars, pixel_perfect=pixel_perfect
    )
