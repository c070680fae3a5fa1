"""Level-synchronous 2D MPR rasterizer.

The TPU redesign of the reference's recursive tile renderer
(fidget-raster/src/pixel.rs:313-437): instead of per-tile recursion
with thread-local evaluators, the whole frame advances as dense,
batched levels — the execution model of the wgpu pipeline
(fidget-wgpu/src/voxel/mod.rs:2557-2596) expressed in JAX:

1. **Root interval pass** — one Pallas interval-kernel launch where the
   *lanes* are the root tiles; produces per-tile output intervals plus
   packed 2-bit choice traces.
2. **Batched simplification** — `DeviceSimplifier` specializes the
   tape per root tile, entirely on device.
3. **Subtile interval pass** (two-level mode) — grid instance per root
   tile; lanes are its subtiles, evaluated with the root's specialized
   tape; choices feed `DynamicSimplifier`, which re-specializes every
   subtile's tape from its parent's *dynamic* tape — the wgpu
   per-level tape_simplify loop (interval_tiles.wgsl:20-129).
4. **Leaf pass** — one Pallas float-kernel launch, one grid instance
   per (sub)tile, each evaluating its own simplified tape over its
   pixels. Culled tiles get their tape length zeroed, so their
   instances cost nothing — the static-shape analog of "skip the
   tile".
5. **Assembly** — distances and fills combine through dense reshapes.

Everything from (1) to (5) is traced into a single XLA computation, so
a frame is one device dispatch. The default is a single 128-px tile
level (measured fastest on TPU v5e; the reference's two-level JIT
hints (128, 32) (fidget-jit/src/lib.rs:967-971) optimize a per-op CPU
cost model, while the Pallas interpreter's cost is per (instance,
step) — larger single-level tiles amortize it and device-side
per-tile simplification replaces the recursion).
"""

from __future__ import annotations

import functools
import threading
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
    _N_OPS,
    default_interpret,
    interp_float,
    interp_interval,
    tape_n_ops,
)
from ..eval.simplify_device import DeviceSimplifier, DynamicSimplifier
from ..eval.unrolled import eval_tape
from ..eval.unrolled_fast import (
    eval_tape_float_fast,
    eval_tape_interval_fast,
)
from ..shape import Shape, ShapeVars
from .region import ImageSize, compose2, mat3_to_mat4
from .transform import transform_intervals, transform_points

#: fill codes in the `fill` channel of a rendered image. Fills proven
#: at deeper cull levels add 2 per level: a level-L inside fill is
#: `FILL_INSIDE + 2 * L` — the int8 analog of the reference's
#: NaN-boxed fill pixels, which pack inside/outside plus the tile
#: depth into the distance f32 (fidget-raster/src/pixel.rs:145-230).
FILL_NONE = 0
FILL_INSIDE = 1
FILL_OUTSIDE = 2


@dataclass
class Image2D:
    """Output of the 2D renderer.

    distance: f32 [H, W] — signed distance where evaluated (garbage in
      filled regions; consult `fill`).
    fill: int8 [H, W] — FILL_NONE where `distance` is valid, else
      FILL_INSIDE/FILL_OUTSIDE (+ 2 per cull level) from interval
      proofs; see `fill_class` / `fill_level`.
    """

    distance: np.ndarray
    fill: np.ndarray

    def fill_class(self) -> np.ndarray:
        """Level-stripped fill codes: FILL_NONE / FILL_INSIDE /
        FILL_OUTSIDE regardless of the cull level that proved them."""
        f = np.asarray(self.fill)
        return np.where(f == FILL_NONE, f, (f - 1) % 2 + 1).astype(np.int8)

    def fill_level(self) -> np.ndarray:
        """Cull level per filled pixel (0 = root tiles, 1 = subtiles);
        -1 where the pixel was evaluated (the reference's per-fill
        depth tag, fidget-raster/src/pixel.rs:176-230)."""
        f = np.asarray(self.fill).astype(np.int16)
        return np.where(f == FILL_NONE, -1, (f - 1) // 2).astype(np.int8)

    def inside(self) -> np.ndarray:
        """Boolean occupancy (the reference's "mono" mode)."""
        return np.where(
            self.fill == FILL_NONE,
            self.distance < 0,
            self.fill_class() == FILL_INSIDE,
        )


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _pad_plane(a, s0):
    """[..., K] -> [..., s0, 128] zero-padded lane planes."""
    K = a.shape[-1]
    padn = s0 * 128 - K
    if padn:
        a = jnp.concatenate(
            [a, jnp.zeros(a.shape[:-1] + (padn,), a.dtype)], axis=-1
        )
    return a.reshape(a.shape[:-1] + (s0, 128))


class _TracedBind:
    """Tape binding for the zero-recompile bucketed pipeline: the
    arena words AND the x/y/z input indices are *traced operands*, so
    every shape in the same (capacity, register-file, choice-words)
    bucket shares one compiled frame (the editor / CLI hot path — the
    Pallas kernels were always tape-as-data, this extends that to the
    glue). Canonical opcode order, single level only."""

    two_level = False
    op_order = None

    def __init__(self, w1, w2, imm, lens, axis_idx, Lcap, nf, V,
                 c_words, interpret, leaf_coded, n_ops=_N_OPS):
        self.arena = (w1, w2, imm, lens)
        self.axis_idx = axis_idx
        self.Lcap, self.nf, self.V = Lcap, nf, V
        self.c_words, self.interpret = c_words, interpret
        self.leaf_coded = leaf_coded
        self.n_ops = n_ops
        self._per_tile = None
        self._root_active = None

    def set_axes(self, planes, triples):
        """planes: tuple of [..., V, s0, 128] arrays; triples: one
        padded plane (or (lo, hi)) per axis k=0,1,2. The input index of
        each axis is a traced i32 (-1 = unused), selected with
        where-masked dynamic writes."""
        for k, plane_k in enumerate(triples):
            idx = self.axis_idx[k]
            ok = idx >= 0
            i = jnp.maximum(idx, 0)
            planes = tuple(
                p.at[..., i, :, :].set(
                    jnp.where(ok, pk, p[..., i, :, :])
                )
                for p, pk in zip(planes, plane_k)
            )
        return planes

    def simplify_root(self, choices0, n0, root_active):
        from ..eval.simplify_device import (
            DeviceSimplifier,
            DynamicSimplifier,
            _liveness_codes,
        )

        w1, w2, imm, lens = self.arena
        Lcap = self.Lcap
        perlane = _liveness_codes(
            w1.reshape(1, 1, Lcap).astype(jnp.int32),
            w2.reshape(1, 1, Lcap).astype(jnp.int32),
            lens.reshape(1, 1, 1).astype(jnp.int32),
            choices0, nf=self.nf, L=Lcap, shared_tape=True,
            interpret=self.interpret,
        )  # [B, lw, s0r, 128]
        B = choices0.shape[0]
        lw = -(-Lcap // 16)
        s0r = choices0.shape[2]
        per_tile = jnp.moveaxis(
            perlane.reshape(B, lw, s0r * 128), 1, 2
        ).reshape(B * s0r * 128, lw)[:n0]
        self._per_tile = per_tile
        self._root_active = root_active
        if self.leaf_coded:
            return None, None, None, None
        codes_u8 = DeviceSimplifier.unpack_codes(per_tile, Lcap)
        w1p = jnp.broadcast_to(w1.astype(jnp.int32), (n0, Lcap))
        w2p = jnp.broadcast_to(w2.astype(jnp.int32), (n0, Lcap))
        immp = jnp.broadcast_to(imm, (n0, Lcap))
        w1c, w2c, immc, lensc, _ = DynamicSimplifier.reconstruct(
            w1p, w2p, immp, codes_u8
        )
        return w1c, w2c, immc, lensc

    def leaf_eval(self, w1c, w2c, immc, lensc, vars_, s0l):
        if self.leaf_coded:
            # skip tape materialization: the leaf walks the shared
            # parent tape with per-tile 2-bit action codes (measured 3x
            # slower than reconstruct+interp_float — kept for the
            # experiment harness)
            from ..eval.pallas_interp import interp_float_coded

            w1, w2, imm, lens = self.arena
            n0 = vars_.shape[0]
            lens_t = jnp.where(
                self._root_active, jnp.broadcast_to(lens, (n0,)), 0
            )
            return interp_float_coded(
                w1.reshape(1, self.Lcap), w2.reshape(1, self.Lcap),
                imm.reshape(1, self.Lcap), lens_t, self._per_tile, vars_,
                nf=self.nf, n_inputs=self.V, n_outputs=1, s0=s0l,
                interpret=self.interpret,
            )[:, 0]
        return interp_float(
            w1c, w2c, immc, lensc, vars_,
            nf=self.nf, n_inputs=self.V, n_outputs=1, s0=s0l,
            interpret=self.interpret, n_ops=self.n_ops,
        )[:, 0]


class _ConstBind:
    """Tape binding for the compile-per-shape pipeline: arenas are
    Python constants with per-shape opcode renumbering (pack.
    frequency_op_order), and the optional second tile level
    re-specializes leaf tapes per subtile."""

    def __init__(self, r):
        self.rend = r
        self.arena = (
            r.packed.w1, r.packed.w2, r.packed.imm, r.packed.lengths,
        )
        self.nf, self.V = r.nf, r.n_inputs
        self.c_words, self.interpret = r.c_words, r.interpret
        self.op_order = r.op_order
        self.n_ops = r.nops_s
        self.two_level = r.two_level

    def set_axes(self, planes, triples):
        for kind, plane_k in zip(("x", "y", "z"), triples):
            idx = self.rend.axis_of.get(kind)
            if idx is not None:
                planes = tuple(
                    p.at[..., idx, :, :].set(pk)
                    for p, pk in zip(planes, plane_k)
                )
        return planes

    def simplify_root(self, choices0, n0, root_active):
        w1s, w2s, imms, lens0, _ = self.rend.simplifier.simplify_packed(
            choices0, n_tiles=n0, interpret=self.interpret
        )
        return w1s, w2s, imms, lens0

    def leaf_eval(self, w1c, w2c, immc, lensc, vars_, s0l):
        return interp_float(
            w1c, w2c, immc, lensc, vars_,
            nf=self.nf, n_inputs=self.V, n_outputs=1, s0=s0l,
            interpret=self.interpret, op_order=self.op_order,
            n_ops=self.n_ops,
        )[:, 0]

    def second_level(self, w1s, w2s, imms, lens0a, x0, y0,
                     root_active, root_in, pixel_perfect,
                     im, mat, z, var_vec):
        """Stages 3-4 of the two-level mode: subtile interval pass with
        the per-tile simplified arenas, then per-subtile
        re-specialization from the dynamic tapes (the wgpu per-level
        tape_simplify loop)."""
        r = self.rend
        T1, m = r.T1, r.m
        n0 = x0.shape[0]
        nc = n0 * m
        sx0 = x0[:, None] + jnp.asarray(r.sub_dx)[None, :]  # [n0, m]
        sy0 = y0[:, None] + jnp.asarray(r.sub_dy)[None, :]
        var_lo1, var_hi1 = r._interval_vars(
            im, mat, z, var_vec, (sx0, sx0 + T1), (sy0, sy0 + T1),
            r.s0s, (n0,),
        )
        olo1, ohi1, choices1 = interp_interval(
            w1s, w2s, imms, lens0a, var_lo1, var_hi1,
            nf=self.nf, n_inputs=self.V, n_outputs=1, s0=r.s0s,
            c_words=self.c_words, interpret=self.interpret,
            op_order=self.op_order, n_ops=self.n_ops,
        )
        slo = olo1[:, 0].reshape(n0, -1)[:, :m]
        shi = ohi1[:, 0].reshape(n0, -1)[:, :m]
        act = root_active[:, None]
        sub_in = act & (shi < 0.0)
        sub_out = act & (slo > 0.0)
        sub_active = act & ~sub_in & ~sub_out
        if pixel_perfect:
            sub_active = jnp.ones_like(sub_active)

        perlane = DynamicSimplifier.codes(
            w1s, w2s, lens0a, choices1, nf=self.nf,
            interpret=self.interpret, op_order=self.op_order,
        )  # [n0, s0s*128, lw]
        per_child = perlane[:, :m].reshape(nc, -1)
        codes_u8 = DeviceSimplifier.unpack_codes(per_child, w1s.shape[1])
        parent = jnp.arange(nc) // m
        w1p = jnp.take(w1s, parent, axis=0)
        w2p = jnp.take(w2s, parent, axis=0)
        immp = jnp.take(imms, parent, axis=0)
        w1c, w2c, immc, lensc, _ = DynamicSimplifier.reconstruct(
            w1p, w2p, immp, codes_u8, op_order=self.op_order
        )
        # subtile-level proofs carry level tag 1; fills inherited from
        # a culled root tile keep level 0
        fill_child = jnp.where(
            sub_active,
            np.int8(FILL_NONE),
            jnp.where(
                act,
                jnp.where(sub_in, np.int8(FILL_INSIDE + 2),
                          np.int8(FILL_OUTSIDE + 2)),
                jnp.where(root_in[:, None], np.int8(FILL_INSIDE),
                          np.int8(FILL_OUTSIDE)),
            ),
        ).astype(jnp.int8).reshape(-1)
        return (
            w1c, w2c, immc, lensc,
            sx0.reshape(-1), sy0.reshape(-1),
            sub_active.reshape(-1), fill_child,
        )


def _frame_core(
    b, T0, T1, n0x, x0, y0, mat, z, var_vec, *,
    pixel_perfect: bool, stop_after: str | None = None,
):
    """THE 2D frame pipeline: root interval cull -> per-tile tape
    simplification -> (optional second level) -> dense leaf pass ->
    assembly, parameterized on the tape binding `b` (_TracedBind |
    _ConstBind). Every pipeline fix lands here once; the bucketed,
    specialized, and two-level paths are bindings, and the sharded
    renderers map this same core over device-mesh slabs."""
    m = (T0 // T1) ** 2
    n0 = x0.shape[0]
    n0y = n0 // n0x
    s0r = max(8, _ceil_to(-(-n0 // 128), 8))
    s0l = (T1 * T1) // 128
    V = b.V
    im = IntervalMode(jnp)

    # ---- stage 1: root interval pass (lanes = root tiles) -----------
    mxi, myi, mzi = transform_intervals(
        im, mat, (x0, x0 + T0), (y0, y0 + T0), (z, z)
    )
    var_lo = jnp.broadcast_to(
        var_vec[None, :, None, None], (1, V, s0r, 128)
    ).astype(jnp.float32)
    var_hi = var_lo
    triples = [
        (
            _pad_plane(jnp.broadcast_to(ivl[0], x0.shape), s0r),
            _pad_plane(jnp.broadcast_to(ivl[1], x0.shape), s0r),
        )
        for ivl in (mxi, myi, mzi)
    ]
    var_lo, var_hi = b.set_axes((var_lo, var_hi), triples)
    w1r, w2r, immr, lensr = b.arena
    olo, ohi, choices0 = interp_interval(
        w1r, w2r, immr, lensr, var_lo, var_hi,
        nf=b.nf, n_inputs=V, n_outputs=1, s0=s0r,
        c_words=b.c_words, interpret=b.interpret, op_order=b.op_order,
        n_ops=getattr(b, "n_ops", _N_OPS),
    )
    rlo = olo[0, 0].reshape(-1)[:n0]
    rhi = ohi[0, 0].reshape(-1)[:n0]
    root_in = rhi < 0.0
    root_out = rlo > 0.0
    root_active = ~(root_in | root_out)
    if pixel_perfect:
        root_active = jnp.ones_like(root_active)
    if stop_after == "root":
        return rlo, choices0

    # ---- stage 2: per-root-tile simplification -----------------------
    w1s, w2s, imms, lens0 = b.simplify_root(choices0, n0, root_active)
    if stop_after == "codes":
        return b._per_tile, root_active
    lens0a = (
        None if lens0 is None else jnp.where(root_active, lens0, 0)
    )
    if stop_after == "simplify":
        return lens0a, w1s

    if not b.two_level:
        w1c, w2c, immc, lensc = w1s, w2s, imms, lens0a
        cx0, cy0 = x0, y0
        leaf_active = root_active
        fill_child = jnp.where(
            root_active,
            np.int8(FILL_NONE),
            jnp.where(root_in, np.int8(FILL_INSIDE),
                      np.int8(FILL_OUTSIDE)),
        ).astype(jnp.int8)
    else:
        # ---- stages 3-4: subtile cull + re-specialization ------------
        (w1c, w2c, immc, lensc, cx0, cy0, leaf_active, fill_child) = (
            b.second_level(
                w1s, w2s, imms, lens0a, x0, y0, root_active, root_in,
                pixel_perfect, im, mat, z, var_vec,
            )
        )

    # ---- stage 5: leaf pass (one instance per leaf tile) -------------
    lensc = None if lensc is None else jnp.where(leaf_active, lensc, 0)
    ii = jnp.arange(T1, dtype=jnp.float32)
    px = cx0[:, None, None] + ii[None, None, :]
    py = cy0[:, None, None] + ii[None, :, None]
    TC = cx0.shape[0]
    px = jnp.broadcast_to(px, (TC, T1, T1)).reshape(TC, s0l, 128)
    py = jnp.broadcast_to(py, (TC, T1, T1)).reshape(TC, s0l, 128)
    mx, my, mz = transform_points(mat, px, py, z)
    vars_ = jnp.broadcast_to(
        var_vec[None, :, None, None], (TC, V, s0l, 128)
    ).astype(jnp.float32)
    (vars_,) = b.set_axes(
        (vars_,),
        [(jnp.broadcast_to(p, (TC, s0l, 128)),) for p in (mx, my, mz)],
    )
    dist = b.leaf_eval(w1c, w2c, immc, lensc, vars_, s0l)
    if stop_after == "leaf":
        return (dist,)

    # ---- stage 6: assemble -------------------------------------------
    r = T0 // T1
    dist = dist.reshape(n0y, n0x, r, r, T1, T1)
    img = dist.transpose(0, 2, 4, 1, 3, 5).reshape(n0y * T0, n0x * T0)
    fg = fill_child.reshape(n0y, n0x, r, r)
    fill = jnp.repeat(
        jnp.repeat(
            fg.transpose(0, 2, 1, 3).reshape(n0y * r, n0x * r), T1, 0
        ),
        T1, 1,
    )
    return img, fill


@functools.lru_cache(maxsize=64)
def _frame_single_fn(
    T0: int, n0x: int, n0y: int, Lcap: int, nf: int, V: int,
    c_words: int, pixel_perfect: bool, interpret: bool,
    stop_after: str | None = None, leaf_coded: bool = False,
    n_ops: int = _N_OPS,
):
    """Builds (and caches) one jitted single-level 2D frame per shape
    bucket — `_frame_core` under a `_TracedBind` (tape words and axis
    indices as traced operands), so every shape whose packed tape fits
    the same (capacity, register-file, inputs) bucket reuses the
    compiled pipeline."""

    def frame(w1, w2, imm, lens, x0, y0, axis_idx, mat, z, var_vec):
        b = _TracedBind(
            w1, w2, imm, lens, axis_idx, Lcap, nf, V, c_words,
            interpret, leaf_coded, n_ops,
        )
        return _frame_core(
            b, T0, T0, n0x, x0, y0, mat, z, var_vec,
            pixel_perfect=pixel_perfect, stop_after=stop_after,
        )

    return jax.jit(frame)


#: constant-tape registry for module-level compiled frame builders:
#: lru-cached builders can't close over unhashable Tape objects, so
#: renderers register them here under id() keys (entries pin the tape,
#: keeping the key stable; tapes are a few hundred KB at most)
_TAPE_REGISTRY: dict[int, tuple] = {}
#: long-lived editor sessions re-lower a tape per edit; unbounded, the
#: registry (tape + packed arena each) and the warm executables would
#: grow without limit. FIFO-bound both; eviction must also invalidate
#: every cache keyed by the evicted id, because releasing the tape lets
#: CPython recycle the id for a different shape.
_REGISTRY_CAP = 64


def _register_tape(key: int, make_entry):
    """Registers a tape under its id, FIFO-evicting beyond the cap.

    `make_entry` is called only on a miss. Eviction drops the evicted
    id's warm executables (2D and 3D key forms) and clears the two
    tape-keyed jitted-frame builders — an id recycled onto a new tape
    must never hit a frame compiled for the old one."""
    if key in _TAPE_REGISTRY:
        return
    while len(_TAPE_REGISTRY) >= _REGISTRY_CAP:
        old = next(iter(_TAPE_REGISTRY))
        del _TAPE_REGISTRY[old]
        with _UWARM_LOCK:
            for k in [
                k for k in _UWARM
                if k[0] == old or (k[0] == "3d" and k[1] == old)
            ]:
                del _UWARM[k]
        _cull_unrolled_fn.cache_clear()
        _frame_unrolled_fn.cache_clear()
    _TAPE_REGISTRY[key] = make_entry()


def _unrolled_cull_stage(
    tape_key, T0, n0, V, x0, y0, mat, z, var_vec, interpret,
):
    """Root interval pass over all tiles, UNROLLED into straight-line
    XLA interval arithmetic (eval_tape_interval_fast): returns
    (root_in, root_out) proof flags [n0].

    The cull used to run through the shared Pallas interval
    interpreter, whose cost is ~90 ns x tape-length per *instance*
    regardless of lane count — ~1 ms of the frame on prospero. The
    unrolled form pays no per-step dispatch and its cost is pure
    VPU arithmetic over [n0] lanes, which also makes fine cull tiles
    (8 px -> 38% active vs 51% at 16 px on prospero 1024^2;
    demos/exp_unrolled_tiles.py) free:
    tile count only widens the lanes. Proofs are sound and, on
    NaN-free paths, identical to the interpreter's (see
    eval_tape_interval_fast's docstring for the NaN relaxation)."""
    tape, packed, axis_of, nf, c_words = _TAPE_REGISTRY[tape_key]
    im = IntervalMode(jnp)
    mxi, myi, mzi = transform_intervals(
        im, mat, (x0, x0 + T0), (y0, y0 + T0), (z, z)
    )
    V = max(1, len(tape.var_map))
    like = x0
    inputs = []
    for i in range(V):
        c = jnp.broadcast_to(var_vec[i], like.shape).astype(jnp.float32)
        inputs.append((c, c))
    for kind, ivl in (("x", mxi), ("y", myi), ("z", mzi)):
        idx = axis_of.get(kind)
        if idx is not None:
            inputs[idx] = (
                jnp.broadcast_to(ivl[0], like.shape),
                jnp.broadcast_to(ivl[1], like.shape),
            )
    los, his = eval_tape_interval_fast(tape, inputs)
    return his[0] < 0.0, los[0] > 0.0


def _cull_sizing_stage(
    tape_key, T0, n0, V, x0, y0, mat, z, var_vec, interpret,
):
    """Pallas-interpreter root interval pass, used ONLY by the cheap
    standalone capacity-sizing dispatch (`_cull_unrolled_fn`): the
    CANONICAL bucketed arena means the kernel is shared with the
    standard pipeline's bucket, so sizing a new shape's worklist costs
    no per-shape compile before the big unrolled-leaf compile."""
    tape, packed, axis_of, nf, c_words = _TAPE_REGISTRY[tape_key]
    op_order = None
    s0r = max(8, _ceil_to(-(-n0 // 128), 8))
    # bound the per-grid-step lane block: the kernel's VMEM footprint
    # is (2*nf register planes + c_words choice planes) x s0 x 128 — at
    # s0 = 128 (16k tiles, e.g. 8-px tiles at 1024^2) that is ~88 MB
    # and the TPU compiler refuses it. Chunk the tiles across the grid
    # dimension instead (tape replicated per step): s0 = 32 is the
    # proven-safe block of the 16-px default, and G = 1 keeps existing
    # configs bit-identical.
    S0C = 32
    G = -(-s0r // S0C)
    s0c = s0r if G == 1 else S0C
    s0r = G * s0c
    im = IntervalMode(jnp)

    def pad_plane(a):
        return _pad_plane(a, s0r).reshape(G, s0c, 128)

    mxi, myi, mzi = transform_intervals(
        im, mat, (x0, x0 + T0), (y0, y0 + T0), (z, z)
    )
    var_lo = jnp.broadcast_to(
        var_vec[None, :, None, None], (G, V, s0c, 128)
    ).astype(jnp.float32)
    var_hi = var_lo
    for kind, ivl in (("x", mxi), ("y", myi), ("z", mzi)):
        idx = axis_of.get(kind)
        if idx is not None:
            lo = pad_plane(jnp.broadcast_to(ivl[0], x0.shape))
            hi = pad_plane(jnp.broadcast_to(ivl[1], x0.shape))
            var_lo = var_lo.at[:, idx].set(lo)
            var_hi = var_hi.at[:, idx].set(hi)

    def rep(a):
        a = jnp.asarray(a)
        return jnp.broadcast_to(a, (G,) + a.shape[1:])

    olo, ohi, _ = interp_interval(
        rep(packed.w1), rep(packed.w2), rep(packed.imm),
        rep(packed.lengths), var_lo, var_hi,
        nf=nf, n_inputs=V, n_outputs=1, s0=s0c,
        c_words=c_words, interpret=interpret, op_order=op_order,
        n_ops=_N_OPS if interpret else tape_n_ops(tape),
    )
    rlo = olo[:, 0].reshape(-1)[:n0]
    rhi = ohi[:, 0].reshape(-1)[:n0]
    return rhi < 0.0, rlo > 0.0


def _unrolled_leaf_stage(tape_key, T0, cx0, cy0, valid, mat, z, var_vec):
    """Whole-tape XLA evaluation of a compacted tile worklist: returns
    f32 [C, T0*T0] distances (0 where the slot is invalid padding)."""
    tape, packed, axis_of, nf, c_words = _TAPE_REGISTRY[tape_key]
    return _unrolled_leaf_eval(
        tape, axis_of, T0, cx0, cy0, valid, mat, z, var_vec
    )


def _unrolled_leaf_eval(tape, axis_of, T0, cx0, cy0, valid, mat, z, var_vec):
    """Unrolls an EXPLICIT tape over a compacted tile worklist (the
    shared body of the full-tape leaf and the per-block union-tape
    leaf segments)."""
    C = cx0.shape[0]
    pp = T0 * T0
    V = max(1, len(tape.var_map))
    ii = jnp.arange(pp, dtype=jnp.float32)
    px = cx0[:, None] + ii[None, :] % T0
    py = cy0[:, None] + ii[None, :] // T0
    mx, my, mz = transform_points(mat, px, py, z)
    # the whole tape chain MUST evaluate in the same [C, pp] shape the
    # planes are built in: a bitcast reshape (e.g. to flat [C*pp]
    # lanes) between the iota-rooted plane construction and the chain
    # stops XLA:TPU fusing across it, materializing one HBM buffer per
    # tape op (measured on prospero 1024^2/16px: 916 MB of temps,
    # 710 MB/frame of traffic, 8.3 ms vs 2.3 ms for the 2D form —
    # demos/exp_leaf_bisect.py). Packing K = 128//pp tiles per
    # 128-lane row to "reclaim" the (128-pp)/128 minor-dim padding is
    # a measured NEGATIVE (2026-08-20, demos/exp_packed_leaf.py):
    # 925 Mpix/s slope at 8 px and 606 at 4 px vs 1156 for this [C, pp]
    # form — the K-way iota select plus the output's 128->pp relayout
    # cost more than the padding they save; XLA:TPU evidently executes
    # narrow-minor-dim elementwise chains without the naive 2x waste.
    inputs = [
        jnp.broadcast_to(var_vec[i], (C, pp)) for i in range(V)
    ]
    for kind, plane in (("x", mx), ("y", my), ("z", mz)):
        idx = axis_of.get(kind)
        if idx is not None:
            inputs[idx] = jnp.broadcast_to(plane, (C, pp))
    outs = eval_tape_float_fast(tape, inputs)
    return jnp.where(valid[:, None], outs[0], 0.0)


@functools.lru_cache(maxsize=32)
def _cull_unrolled_fn(tape_key, T0, n0x, n0y, V, interpret):
    """Standalone jitted cull pass; cheap to compile, used to size the
    leaf capacity BEFORE paying the big unrolled-leaf compile."""
    n0 = n0x * n0y

    def cull(x0, y0, mat, z, var_vec):
        root_in, root_out = _cull_sizing_stage(
            tape_key, T0, n0, V, x0, y0, mat, z, var_vec, interpret
        )
        return (~(root_in | root_out)).sum()

    return jax.jit(cull)


@functools.lru_cache(maxsize=32)
def _frame_unrolled_fn(
    tape_key: int, T0: int, n0x: int, n0y: int, C: int, V: int,
    pixel_perfect: bool, interpret: bool, cull: str = "unrolled",
):
    """Builds (and caches) the tiled-unrolled frame: MPR interval
    culling at `T0`-px tiles + the WHOLE tape unrolled into XLA over a
    compacted worklist of C active tiles — the fidget-JIT analog that
    keeps culling (fidget-jit/src/lib.rs:667-848 compiles per-tape
    machine code; XLA can't compile per-tile in microseconds, so the
    leaf runs the full tape but ONLY on interval-active tiles; XLA
    fuses over the flat [C, T0*T0] pixel batch, so small tiles cull
    tightly without lane-padding waste).

    cull: "unrolled" unrolls the interval pass into the program too
    (fastest steady-state); "interp" runs it through the shared Pallas
    interval interpreter instead — ~1/3 the XLA program (the interval
    arithmetic is the bulk of the op count), so the per-shape compile
    is much cheaper at ~1 ms/frame interpreter cost. Proofs agree on
    NaN-free paths (eval_tape_interval_fast's documented relaxation).

    Returns a jitted frame(x0, y0, mat, z, var_vec) ->
    (img, fill, n_active); n_active > C means worklist overflow (the
    host retries with the next capacity bucket, same pattern as the 3D
    renderer).
    """
    tape, packed, axis_of, nf, c_words = _TAPE_REGISTRY[tape_key]
    n0 = n0x * n0y
    pp = T0 * T0
    cull_stage = {
        "unrolled": _unrolled_cull_stage, "interp": _cull_sizing_stage,
    }[cull]

    def frame(x0, y0, mat, z, var_vec):
        # ---- stage 1: root interval pass (lanes = tiles) -------------
        root_in, root_out = cull_stage(
            tape_key, T0, n0, V, x0, y0, mat, z, var_vec, interpret
        )
        act = ~(root_in | root_out)
        if pixel_perfect:
            act = jnp.ones_like(act)
        n_active = act.sum()

        # ---- stage 2: compact active tiles to capacity C -------------
        # stable prefix-sum compaction (active tiles first, row-major):
        # the old `argsort(~act)[:C]` cost 0.14 ms/frame of the 0.96 ms
        # total at 8 px (demos/exp_unrolled_stages.py); a cumsum + one
        # 1D scatter is ~10x cheaper and gives `slot_of` for free
        pos = jnp.cumsum(act.astype(jnp.int32)) - 1  # dest slot per tile
        # distinct out-of-bounds dests for culled tiles keep the
        # unique_indices guarantee honest (all are dropped); the flag
        # lets XLA vectorize the scatter (demos/exp_compact.py: 117 ->
        # 87 us, matching argsort, while slot_of below stays free).
        # Culled dests start past C + n0 so they can never collide
        # with an overflowing active pos (pos < n0 <= C + n0)
        dest = jnp.where(act, pos, C + n0 + jnp.arange(n0, dtype=jnp.int32))
        o1 = (
            jnp.zeros(C, jnp.int32)
            .at[dest]
            .set(jnp.arange(n0, dtype=jnp.int32) + 1, mode="drop",
                 unique_indices=True)
        )
        valid = o1 > 0
        order = jnp.maximum(o1 - 1, 0)
        cx0 = x0[order]
        cy0 = y0[order]

        # ---- stage 3: unrolled leaf over the compacted worklist ------
        dist_c = _unrolled_leaf_stage(
            tape_key, T0, cx0, cy0, valid, mat, z, var_vec
        )

        # ---- stage 4: scatter back + assemble ------------------------
        slot_of = jnp.where(act & (pos < C), pos, C)
        dist_pad = jnp.concatenate(
            [dist_c, jnp.zeros((1, pp), jnp.float32)], axis=0
        )
        dist = dist_pad[slot_of].reshape(n0y, n0x, T0, T0)
        img = dist.transpose(0, 2, 1, 3).reshape(n0y * T0, n0x * T0)
        fill_tile = jnp.where(
            act,
            np.int8(FILL_NONE),
            jnp.where(root_in, np.int8(FILL_INSIDE), np.int8(FILL_OUTSIDE)),
        ).astype(jnp.int8)
        fill = jnp.repeat(
            jnp.repeat(fill_tile.reshape(n0y, n0x), T0, 0), T0, 1
        )
        return img, fill, n_active

    return jax.jit(frame)


def _unrolled_cull_capture_stage(tape_key, T0, x0, y0, mat, z, var_vec):
    """Unrolled root interval pass WITH packed 2-bit choice capture:
    returns (root_in, root_out, words) where `words` is a list of
    ceil(choice_count/16) int32 arrays [n0] in the layout
    compiler.unions.pack_choices mirrors (the per-frame evidence for
    union-tape validity routing)."""
    tape, packed, axis_of, nf, c_words = _TAPE_REGISTRY[tape_key]
    im = IntervalMode(jnp)
    mxi, myi, mzi = transform_intervals(
        im, mat, (x0, x0 + T0), (y0, y0 + T0), (z, z)
    )
    V = max(1, len(tape.var_map))
    like = x0
    inputs = []
    for i in range(V):
        c = jnp.broadcast_to(var_vec[i], like.shape).astype(jnp.float32)
        inputs.append((c, c))
    for kind, ivl in (("x", mxi), ("y", myi), ("z", mzi)):
        idx = axis_of.get(kind)
        if idx is not None:
            inputs[idx] = (
                jnp.broadcast_to(ivl[0], like.shape),
                jnp.broadcast_to(ivl[1], like.shape),
            )
    los, his, words = eval_tape_interval_fast(tape, inputs, capture=True)
    return his[0] < 0.0, los[0] > 0.0, words


def _unrolled_cull_violation_stage(
    tape_key, T0, x0, y0, mat, z, var_vec, u_tile,
):
    """Unrolled root interval pass with a FUSED per-tile union-validity
    test: returns (root_in, root_out, viol) where viol is True for
    tiles whose choice trace escapes their block union (u_tile [cw, n0]
    word-major packed reference codes). One running bool accumulator
    instead of materialized choice words — the capture variant cost
    +0.38 ms of the 0.9 ms prospero frame (demos/exp_union_stages.py)."""
    tape, packed, axis_of, nf, c_words = _TAPE_REGISTRY[tape_key]
    im = IntervalMode(jnp)
    mxi, myi, mzi = transform_intervals(
        im, mat, (x0, x0 + T0), (y0, y0 + T0), (z, z)
    )
    V = max(1, len(tape.var_map))
    like = x0
    inputs = []
    for i in range(V):
        c = jnp.broadcast_to(var_vec[i], like.shape).astype(jnp.float32)
        inputs.append((c, c))
    for kind, ivl in (("x", mxi), ("y", myi), ("z", mzi)):
        idx = axis_of.get(kind)
        if idx is not None:
            inputs[idx] = (
                jnp.broadcast_to(ivl[0], like.shape),
                jnp.broadcast_to(ivl[1], like.shape),
            )
    los, his, viol = eval_tape_interval_fast(
        tape, inputs, u_words=u_tile
    )
    return his[0] < 0.0, los[0] > 0.0, viol


#: UnionPlan registry for the union-leaf jitted frames (plans are
#: unhashable; the cached frame builders key on id(plan) and entries
#: pin the plan so ids stay stable). FIFO-bounded like _TAPE_REGISTRY.
_PLAN_REGISTRY: dict[int, object] = {}


def _register_plan(plan) -> int:
    key = id(plan)
    if key not in _PLAN_REGISTRY:
        while len(_PLAN_REGISTRY) >= _REGISTRY_CAP:
            old = next(iter(_PLAN_REGISTRY))
            del _PLAN_REGISTRY[old]
            _frame_union_fn.cache_clear()
        _PLAN_REGISTRY[key] = plan
    return key


@functools.lru_cache(maxsize=32)
def _frame_union_fn(
    tape_key: int, plan_key: int, T0: int, n0x: int, n0y: int,
    fb_cap: int, V: int, pixel_perfect: bool, interpret: bool,
    stop_after: str | None = None,
):
    """Builds the union-leaf unrolled frame: interval cull WITH choice
    capture, per-tile validity routing against the plan's block-union
    tapes, per-program compacted worklists, one unrolled leaf segment
    per union program (4.5x fewer ops/tile than the full tape at
    256-px blocks on prospero) plus a small full-tape fallback
    worklist for tiles whose trace escapes their block union (camera
    drift; correctness never depends on plan freshness — see
    compiler/unions.py).

    Returns jitted frame(x0, y0, mat, z, var_vec) ->
    (img, fill, n_active, n_fallback, n_over); n_over > 0 means a
    worklist overflowed and the caller must rebuild/retry.
    """
    tape, packed, axis_of, nf, c_words = _TAPE_REGISTRY[tape_key]
    plan = _PLAN_REGISTRY[plan_key]
    n0 = n0x * n0y
    pp = T0 * T0
    P = len(plan.programs)
    caps = plan.caps.astype(np.int64)
    base = np.concatenate([[0], np.cumsum(caps)]).astype(np.int64)
    fb_base = int(base[P])
    total = fb_base + fb_cap

    # ---- static routing/compaction tables ----------------------------
    # The WHOLE pipeline runs in block-major (permuted) tile order:
    # the traced tile coordinates are gathered by the static `perm`
    # once at the top, so per-program tiles are contiguous and the
    # routing needs no runtime permutation gathers (two bool gathers
    # here measured inside a +0.43 ms compact stage,
    # demos/exp_union_stages3.py); only the final assembly unpermutes
    # (one static-index int gather it needed anyway).
    bp = plan.block_prog  # [n0] int32, -1 = no program for this block
    order_key = np.where(bp < 0, P, bp)
    perm = np.argsort(order_key, kind="stable")
    inv_perm = np.argsort(perm)
    prog_perm = order_key[perm]
    seg_start = np.searchsorted(prog_perm, np.arange(max(P, 1)))
    seg_end = np.searchsorted(prog_perm, np.arange(max(P, 1)) + 1)
    seg_len = (seg_end - seg_start).astype(np.int64)
    n_prog_tiles = int(seg_end[P - 1]) if P else 0
    safe_prog = np.minimum(prog_perm, max(P - 1, 0))
    base_of_tile = base[safe_prog]
    cap_of_tile = caps[safe_prog] if P else np.zeros(n0, np.int64)
    # per-tile union words in PERMUTED order, word-major
    u_tile = (
        plan.u_packed[np.maximum(bp, 0)][perm]
        if P
        else np.zeros((n0, 1), np.uint32)
    )
    has_prog = (bp >= 0)[perm]

    def frame(x0, y0, mat, z, var_vec):
        # block-major order throughout: permute the tile coords once
        xp = x0[jnp.asarray(perm)]
        yp = y0[jnp.asarray(perm)]

        # ---- stage 1: cull + FUSED union-validity test ---------------
        root_in, root_out, viol = _unrolled_cull_violation_stage(
            tape_key, T0, xp, yp, mat, z, var_vec,
            jnp.asarray(np.ascontiguousarray(u_tile.T)),
        )
        act = ~(root_in | root_out)
        if pixel_perfect:
            act = jnp.ones_like(act)
        n_active = act.sum()
        if stop_after == "cull":
            return act, viol

        # ---- stage 2: per-program compaction -------------------------
        m_own = act & jnp.asarray(has_prog) & ~viol
        c = jnp.cumsum(m_own.astype(jnp.int32))
        # per-program start counts: c at the 16 static segment ends,
        # expanded by static-length broadcasts (a per-tile gather of
        # c_pad[seg_start] was part of the +0.43 ms compact stage)
        if P:
            ends = c[jnp.asarray(seg_end - 1)]
            sc = jnp.concatenate([jnp.zeros(1, jnp.int32), ends])
            parts = [
                jnp.broadcast_to(sc[p], (int(seg_len[p]),))
                for p in range(P)
            ]
            if n_prog_tiles < n0:
                parts.append(jnp.zeros(n0 - n_prog_tiles, jnp.int32))
            start_cnt = jnp.concatenate(parts)
        else:
            start_cnt = jnp.zeros(n0, jnp.int32)
        rank = c - 1 - start_cnt
        ok_own = m_own & (rank < jnp.asarray(cap_of_tile))
        dest_own = jnp.asarray(base_of_tile).astype(jnp.int32) + rank
        m_fb = act & ~m_own
        cf = jnp.cumsum(m_fb.astype(jnp.int32)) - 1
        ok_fb = m_fb & (cf < fb_cap)
        dest_fb = fb_base + cf
        ok = ok_own | ok_fb
        dest = jnp.where(ok_own, dest_own, dest_fb)
        n_fb = m_fb.sum()
        n_over = (m_own & ~ok_own).sum() + (m_fb & ~ok_fb).sum()
        if stop_after == "compact":
            return dest, ok, n_active

        # ONE index scatter (permuted-position + 1), coordinates come
        # by gather — three payload scatters measured +0.27 ms vs this
        # (demos/exp_union_stages.py; same trick as the full-leaf path)
        dest_u = jnp.where(
            ok, dest, total + jnp.arange(n0, dtype=jnp.int32)
        )
        o1 = (
            jnp.zeros(total, jnp.int32)
            .at[dest_u]
            .set(jnp.arange(1, n0 + 1, dtype=jnp.int32), mode="drop",
                 unique_indices=True)
        )
        vs = o1 > 0
        order = jnp.maximum(o1 - 1, 0)
        sx = xp[order]
        sy = yp[order]
        if stop_after == "scatter":
            return sx, sy, vs

        # ---- stage 4: leaf — one unrolled segment per union program --
        segs = []
        for p in range(P):
            sl = slice(int(base[p]), int(base[p + 1]))
            segs.append(
                _unrolled_leaf_eval(
                    plan.programs[p], axis_of, T0,
                    sx[sl], sy[sl], vs[sl], mat, z, var_vec,
                )
            )
        # fallback segment: the FULL tape
        fl = slice(fb_base, total)
        segs.append(
            _unrolled_leaf_eval(
                tape, axis_of, T0, sx[fl], sy[fl], vs[fl],
                mat, z, var_vec,
            )
        )
        dist_all = jnp.concatenate(segs, axis=0)
        if stop_after == "leaf":
            return (dist_all,)

        # ---- stage 5: scatter back + assemble ------------------------
        # everything above ran block-major; unpermute per-tile results
        # with the one static-index gather the assembly needed anyway
        slot_p = jnp.where(ok, dest, total)
        fill_p = jnp.where(
            act,
            np.int8(FILL_NONE),
            jnp.where(root_in, np.int8(FILL_INSIDE),
                      np.int8(FILL_OUTSIDE)),
        ).astype(jnp.int8)
        slot_of = slot_p[jnp.asarray(inv_perm)]
        fill_tile = fill_p[jnp.asarray(inv_perm)]
        dist_pad = jnp.concatenate(
            [dist_all, jnp.zeros((1, pp), jnp.float32)], axis=0
        )
        dist = dist_pad[slot_of].reshape(n0y, n0x, T0, T0)
        img = dist.transpose(0, 2, 1, 3).reshape(n0y * T0, n0x * T0)
        fill = jnp.repeat(
            jnp.repeat(fill_tile.reshape(n0y, n0x), T0, 0), T0, 1
        )
        return img, fill, n_active, n_fb, n_over

    return jax.jit(frame)


#: async warm-up states for `render_unrolled(warmup="interp")`:
#: state_key -> "compiling" | "failed" | compiled XLA executable
_UWARM: dict = {}
_UWARM_LOCK = threading.Lock()
_UWARM_CAP = 64


def _warm_async(fn, args, state_key, kwargs=None):
    """Non-blocking access to a jitted frame: returns a ready-to-call
    executable if the background compile has finished, else kicks off
    (at most one) compile thread and returns None. `fn.lower().compile()`
    runs entirely host-side — no device dispatch, so the interpreter
    fallback can keep the chip busy while XLA compiles. `kwargs` pass
    static keyword arguments to lower(); the compiled executable is
    then called with the positional args only."""
    with _UWARM_LOCK:
        st = _UWARM.get(state_key)
        if st is None:
            _UWARM[state_key] = "compiling"

            def compile_bg():
                try:
                    compiled = fn.lower(*args, **(kwargs or {})).compile()
                except Exception:
                    with _UWARM_LOCK:
                        # surface the error on the caller's thread via
                        # the ordinary blocking path
                        _UWARM[state_key] = "failed"
                    return
                with _UWARM_LOCK:
                    _UWARM[state_key] = compiled
                    # FIFO-bound finished entries (executables +
                    # "failed" sentinels); never evict an in-flight
                    # compile marker
                    done = [
                        k for k, v in _UWARM.items() if v != "compiling"
                    ]
                    for k in done[: max(0, len(done) - _UWARM_CAP)]:
                        del _UWARM[k]

            threading.Thread(target=compile_bg, daemon=True).start()
            return None
    if st == "compiling":
        return None
    if st == "failed":
        return fn
    return st


class PixelRenderer:
    """Compiled 2D renderer for one tape at one image size.

    Args:
      tape: the shape's register tape or a Shape (single output).
      image_size: output size in pixels.
      tile_size: single-level mode: root tile edge; leaves evaluate at
        this granularity with one simplification level. The default is
        a single 128-px level (measured fastest on TPU v5e).
      tile_sizes: explicit level list, e.g. (128, 32) for two-level
        mode where leaf tapes are re-specialized per subtile (6x
        slower than single-level on the interpreter path at 1024^2 —
        useful for fine fill proofs, not throughput).
      interpret: force Pallas interpret mode (None = auto by platform).
    """

    def __init__(
        self,
        tape: Tape | Shape,
        image_size: ImageSize,
        *,
        tile_size: int | None = None,
        tile_sizes: tuple | None = None,
        interpret: bool | None = None,
        specialize: bool = False,
    ):
        self.shape_transform = None
        if isinstance(tape, Shape):
            self.shape_transform = tape.transform
            tape = tape.tape()
        assert tape.output_count == 1, "2D rendering expects a single output"
        self.tape = tape
        self.size = image_size
        if tile_size is not None and tile_sizes is not None:
            raise ValueError("pass either tile_size or tile_sizes")
        if tile_size is not None:
            tile_sizes = (tile_size,)
        if tile_sizes is None:
            # single-level 128 is the measured-fastest default on TPU:
            # interpreter cost is per (instance, step), so fewer/larger
            # tiles amortize the serial step cost better than the extra
            # specialization of a second level recovers; 128 is the
            # largest register file x lane block that fits VMEM
            tile_sizes = (128,)
        assert len(tile_sizes) in (1, 2)
        self.tile_sizes = tuple(int(t) for t in tile_sizes)
        self.two_level = len(self.tile_sizes) == 2
        # specialize=True: render() uses the compile-per-shape pipeline
        # (per-shape opcode renumbering; ~2x the bucketed tape-as-data
        # path on big tapes) instead of the zero-recompile bucket
        self.specialize = specialize
        self.interpret = default_interpret() if interpret is None else interpret

        T0 = self.tile_sizes[0]
        T1 = self.tile_sizes[-1]
        assert T0 % T1 == 0
        assert (T1 * T1) % 128 == 0, "leaf tile must fill 128-lane planes"
        self.T0, self.T1 = T0, T1
        self.r = T0 // T1
        self.m = self.r * self.r

        self.W = image_size.width
        self.H = image_size.height
        self.n0x = -(-self.W // T0)
        self.n0y = -(-self.H // T0)
        self.n0 = self.n0x * self.n0y
        self.nc = self.n0 * self.m
        # lane layouts
        self.s0r = max(8, _ceil_to(-(-self.n0 // 128), 8))
        self.s0s = max(1, -(-self.m // 128))
        self.s0l = (T1 * T1) // 128

        self.nf = tape.reg_count + tape.mem_count
        # packed arena / simplifier / jitted frame are built lazily:
        # the bucketed single-level render() path never needs them
        self._packed = None
        self._simplifier = None
        self._frame_jit = None
        self._op_order = None
        self._dense_jit = None
        # padded to >= 1 so constant-only shapes still build var planes
        self.n_inputs = max(1, len(tape.var_map))
        self.c_words = max(1, -(-tape.choice_count // 16))
        self.axis_of = {v.kind: i for v, i in tape.var_map.items()}

        # static screen coordinates of root tiles (row-major)
        tx = np.arange(self.n0x) * T0
        ty = np.arange(self.n0y) * T0
        gx, gy = np.meshgrid(tx, ty)
        self.tile_x0 = gx.reshape(-1).astype(np.float32)
        self.tile_y0 = gy.reshape(-1).astype(np.float32)
        # subtile offsets within a root tile, (sy, sx) row-major
        k = np.arange(self.m)
        self.sub_dx = ((k % self.r) * T1).astype(np.float32)
        self.sub_dy = ((k // self.r) * T1).astype(np.float32)
        # bucketed tape-as-data dims (canonical op order): the
        # compiled kernels/frames are shared by every shape in the same
        # (capacity, register-file, choice-words) bucket. Used by the
        # single-level render() path and the unrolled mode's cull pass.
        self.Lcap_b = max(64, 1 << (len(tape) - 1).bit_length())
        self.nf_b = _ceil_to(max(self.nf, 64), 64)
        self.cw_b = max(1, 1 << (self.c_words - 1).bit_length())
        # dispatch-vocabulary bucket: interpret mode keeps the full
        # switch so CPU-test kernels stay shared; on hardware the
        # kernels drop branch positions this tape cannot reach
        self.nops_b = _N_OPS if self.interpret else tape_n_ops(tape)
        self.packed_b = pack_tapes([tape], capacity=self.Lcap_b)
        if not self.two_level:
            self.axis_idx = np.array(
                [
                    -1 if self.axis_of.get(k2) is None else self.axis_of[k2]
                    for k2 in ("x", "y", "z")
                ],
                np.int32,
            )

    # ------------------------------------------------------------------

    @property
    def op_order(self):
        """Per-shape opcode renumbering for the compile-per-shape
        (constant-tape) path: this shape's hottest ops take the first
        switch-scan positions (~11 ns per position saved per step)."""
        if self._op_order is None:
            from ..compiler.pack import frequency_op_order

            self._op_order = frequency_op_order(self.tape)
        return self._op_order

    @property
    def nops_s(self):
        """Vocabulary size under the per-shape opcode renumbering."""
        if self.interpret:
            return _N_OPS
        return tape_n_ops(self.tape, self.op_order)

    @property
    def packed(self):
        if self._packed is None:
            self._packed = pack_tapes([self.tape], op_order=self.op_order)
        return self._packed

    @property
    def simplifier(self):
        if self._simplifier is None:
            self._simplifier = DeviceSimplifier(self.tape, self.op_order)
        return self._simplifier

    @property
    def _frame(self):
        if self._frame_jit is None:
            self._frame_jit = jax.jit(
                self._frame_impl, static_argnames=("pixel_perfect",)
            )
        return self._frame_jit

    def _transform_points(self, mat, xs, ys, z):
        """Shared homogeneous transform (render/transform.py) with the
        2D renderer's scalar z."""
        return transform_points(mat, xs, ys, z)

    def _transform_intervals(self, im, mat, xi, yi, z):
        """Shared interval transform with a degenerate [z, z] slab."""
        return transform_intervals(im, mat, xi, yi, (z, z))

    def _interval_vars(self, im, mat, z, var_vec, xi, yi, s0, lead):
        """Interval var planes [lead..., V, s0, 128] from screen
        interval pairs of shape [lead..., K]."""
        mxi, myi, mzi = self._transform_intervals(im, mat, xi, yi, z)
        V = self.n_inputs
        shape = lead + (V, s0, 128)
        var_lo = jnp.broadcast_to(
            var_vec.reshape((1,) * len(lead) + (V, 1, 1)), shape
        ).astype(jnp.float32)
        var_hi = var_lo

        def pad_plane(a):
            return _pad_plane(a, s0)

        for kind, ivl in (("x", mxi), ("y", myi), ("z", mzi)):
            idx = self.axis_of.get(kind)
            if idx is not None:
                sel = (slice(None),) * len(lead) + (idx,)
                lo = jnp.broadcast_to(ivl[0], xi[0].shape)
                hi = jnp.broadcast_to(ivl[1], xi[0].shape)
                var_lo = var_lo.at[sel].set(pad_plane(lo))
                var_hi = var_hi.at[sel].set(pad_plane(hi))
        return var_lo, var_hi

    # ------------------------------------------------------------------

    def _frame_impl(self, mat, z, var_vec, *, pixel_perfect: bool):
        img, fill = self._frame_tiles(
            mat, z, var_vec,
            jnp.asarray(self.tile_x0), jnp.asarray(self.tile_y0),
            pixel_perfect=pixel_perfect,
        )
        return img[: self.H, : self.W], fill[: self.H, : self.W]

    def _frame_tiles(
        self, mat, z, var_vec, x0, y0, *, pixel_perfect: bool,
        stop_after: str | None = None,
    ):
        """Runs the unified pipeline (`_frame_core` under a
        `_ConstBind`) over an arbitrary set of root tiles whose corner
        coordinates are *traced* inputs — the shardable core:
        `parallel.sharding` maps this over tile-row slabs of a device
        mesh with zero cross-device communication. Tiles are row-major
        with `n0x` columns; returns the uncropped (img, fill) slab."""
        return _frame_core(
            _ConstBind(self), self.T0, self.T1, self.n0x,
            x0, y0, mat, z, var_vec,
            pixel_perfect=pixel_perfect, stop_after=stop_after,
        )

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
        cancel=None,
    ) -> Image2D:
        """Renders a frame; one device dispatch. A fired CancelToken
        raises RenderCancelled before the dispatch (a frame is one XLA
        computation, so there is no finer-grained poll point)."""
        from .config import check_cancel

        check_cancel(cancel)
        mat = jnp.asarray(self._mat4(world_to_model))
        vec = jnp.asarray(self._var_vec(vars))
        if not self.two_level and not self.specialize:
            fn = _frame_single_fn(
                self.T0, self.n0x, self.n0y, self.Lcap_b, self.nf_b,
                self.n_inputs, self.cw_b, pixel_perfect, self.interpret,
                n_ops=self.nops_b,
            )
            p = self.packed_b
            img, fill = fn(
                jnp.asarray(p.w1), jnp.asarray(p.w2), jnp.asarray(p.imm),
                jnp.asarray(p.lengths), jnp.asarray(self.tile_x0),
                jnp.asarray(self.tile_y0), jnp.asarray(self.axis_idx),
                mat, jnp.float32(z), vec,
            )
            return Image2D(
                np.asarray(img)[: self.H, : self.W],
                np.asarray(fill)[: self.H, : self.W],
            )
        img, fill = self._frame(
            mat, jnp.float32(z), vec, pixel_perfect=pixel_perfect
        )
        return Image2D(np.asarray(img), np.asarray(fill))

    def render_unrolled(
        self,
        world_to_model: np.ndarray | None = None,
        *,
        z: float = 0.0,
        vars: "ShapeVars | dict | None" = None,
        pixel_perfect: bool = False,
        tile_size: int = 8,
        cap: int | None = None,
        max_retries: int = 3,
        cull: str = "unrolled",
        warmup: str = "block",
        leaf: str = "full",
        block_px: int = 256,
        cancel=None,
    ) -> Image2D:
        """Tiled-unrolled render: interval culling + the whole tape
        compiled (unrolled) into XLA over only the ACTIVE tiles — the
        fidget-JIT analog with culling. The first render runs a cheap
        standalone cull pass to size the worklist BEFORE paying the
        per-shape leaf compile; capacities bucket to n0/8 granularity
        so overflow retries (and their recompiles) are rare. 8-px
        tiles are the measured default since the round-3 fusion fix
        made leaf cost track the active fraction (prospero 1024^2:
        38% active at 8 px = 1156 Mpix/s vs 51%/855 at 16 px and
        75%/766 at 32 px; the 16k-tile cull+argsort cost ~0.25 ms —
        demos/exp_unrolled_tiles.py, 2026-08-19). cull="interp" swaps
        the unrolled interval pass for the shared Pallas interpreter —
        a ~3x cheaper per-shape compile at ~1 ms/frame cost (see
        _frame_unrolled_fn).

        warmup: "block" (default) compiles the unrolled frame on first
        use (~44 s cold per shape on a v5e; seconds with a persistent
        compile cache). "interp" never blocks interactivity on that
        compile: while the unrolled frame compiles in a BACKGROUND
        thread (XLA releases the GIL), frames are served by the shared
        zero-recompile interpreter pipeline (`render()`, ~109 Mpix/s),
        switching to the unrolled path (~350 Mpix/s) the moment the
        executable is ready — the TPU answer to fidget's
        microsecond-latency per-tape JIT for interactive editing.
        Fallback frames match unrolled frames exactly on occupancy;
        evaluated distances differ only within float tolerance (the
        interpreter leaf runs per-tile simplified tapes).

        leaf: "full" (default) evaluates the whole tape on every
        active tile; "union" evaluates per-block UNION-simplified
        tapes (4.5x fewer ops/tile at 256-px blocks on prospero) with
        per-frame validity routing — tiles whose captured choice trace
        escapes their block's union run the full tape on a small
        fallback worklist, so results are exact for ANY camera (see
        compiler/unions.py). The plan is built on the host at the
        first render's camera; a worklist overflow rebuilds it at the
        current camera (recompile). block_px sets the block edge."""
        from .config import check_cancel

        T0 = int(tile_size)
        n0x = -(-self.W // T0)
        n0y = -(-self.H // T0)
        n0 = n0x * n0y
        key = id(self.tape)
        _register_tape(key, lambda: (
            self.tape, self.packed_b, self.axis_of,
            self.nf_b, self.cw_b,
        ))
        tx = np.arange(n0x) * T0
        ty = np.arange(n0y) * T0
        gx, gy = np.meshgrid(tx, ty)
        x0 = jnp.asarray(gx.reshape(-1).astype(np.float32))
        y0 = jnp.asarray(gy.reshape(-1).astype(np.float32))
        mat_np = self._mat4(world_to_model)
        vec_np = self._var_vec(vars)
        mat = jnp.asarray(mat_np)
        vec = jnp.asarray(vec_np)

        if leaf == "union":
            from ..compiler.unions import build_union_plan

            self._uplans = getattr(self, "_uplans", {})
            pk = (T0, block_px)
            plan = self._uplans.get(pk)
            if plan is None:
                check_cancel(cancel)
                plan = build_union_plan(
                    self.tape, T0, n0x, n0y, mat_np, z, vec_np,
                    self.axis_of, block_px=block_px,
                )
                self._uplans[pk] = plan
                _register_plan(plan)
            fb_cap = max(128, _ceil_to(n0 // 64, 128))
            self.union_stats = None
            for attempt in range(max_retries + 1):
                check_cancel(cancel)
                fn = _frame_union_fn(
                    key, _register_plan(plan), T0, n0x, n0y, fb_cap,
                    self.n_inputs, pixel_perfect, self.interpret,
                )
                if warmup == "interp":
                    fn = _warm_async(
                        fn, (x0, y0, mat, jnp.float32(z), vec),
                        ("union", key, id(plan), T0, n0x, n0y, fb_cap,
                         self.n_inputs, pixel_perfect, self.interpret),
                    )
                    if fn is None:
                        return self.render(
                            world_to_model, z=z, vars=vars,
                            pixel_perfect=pixel_perfect, cancel=cancel,
                        )
                img, fill, n_active, n_fb, n_over = fn(
                    x0, y0, mat, jnp.float32(z), vec
                )
                if int(n_over) == 0:
                    self.union_stats = {
                        "n_active": int(n_active),
                        "n_fallback": int(n_fb),
                        **plan.stats(),
                    }
                    # STALENESS auto-refresh: a drifting camera sends
                    # a growing share of tiles to the full-tape
                    # fallback (correct but slower — it mirrors the
                    # reference invalidating its cached simplification
                    # on trace change, render/mod.rs:122-129). Above
                    # 5% fallback, rebuild the plan for the CURRENT
                    # camera in a background thread and swap it in
                    # once its frame is compiled; frames keep flowing
                    # through the stale plan meanwhile.
                    self._uplan_refresh = getattr(
                        self, "_uplan_refresh", {}
                    )
                    if (
                        int(n_fb) > max(16, int(n_active) * 0.05)
                        and not self._uplan_refresh.get(pk)
                    ):
                        self._uplan_refresh[pk] = True

                        def rebuild(mat_np=mat_np, z=z, vec_np=vec_np):
                            try:
                                p2 = build_union_plan(
                                    self.tape, T0, n0x, n0y, mat_np,
                                    z, vec_np, self.axis_of,
                                    block_px=block_px,
                                )
                                f2 = _frame_union_fn(
                                    key, _register_plan(p2), T0, n0x,
                                    n0y, fb_cap, self.n_inputs,
                                    pixel_perfect, self.interpret,
                                )
                                f2.lower(
                                    x0, y0, mat, jnp.float32(z), vec
                                ).compile()
                                self._uplans[pk] = p2
                            finally:
                                self._uplan_refresh[pk] = False

                        threading.Thread(
                            target=rebuild, daemon=True
                        ).start()
                    return Image2D(
                        np.asarray(img)[: self.H, : self.W],
                        np.asarray(fill)[: self.H, : self.W],
                    )
                # overflow: the camera has drifted past the plan's
                # capacities — rebuild at the CURRENT camera with
                # growing headroom (each retry recompiles, so frames
                # in between should use warmup="interp")
                plan = build_union_plan(
                    self.tape, T0, n0x, n0y, mat_np, z, vec_np,
                    self.axis_of, block_px=block_px,
                    headroom=1.15 + 0.25 * (attempt + 1),
                )
                self._uplans[pk] = plan
                _register_plan(plan)
            # retries exhausted: serve the frame via the full-tape leaf
            return self.render_unrolled(
                world_to_model, z=z, vars=vars,
                pixel_perfect=pixel_perfect, tile_size=tile_size,
                cap=cap, max_retries=max_retries, cull=cull,
                warmup=warmup, leaf="full", cancel=cancel,
            )

        def bucket(n):
            # 8% headroom rounded to 128 slots: with the cull sizing
            # pass at ~0.25 ms, fine buckets cost little compile-variant
            # churn and reclaim the ~11-21% leaf padding the old n0/8
            # granularity left (VERDICT r3 item 8). Overflow (camera
            # motion growing the active set past the headroom) still
            # retries into a bigger bucket exactly as before.
            return min(_ceil_to(int(int(n) * 1.08) + 1, 128), n0)

        self._ucap = getattr(self, "_ucap", {})
        if pixel_perfect:
            cap = n0
        elif cap is None:
            cap = self._ucap.get(T0)
            if cap is None:
                # cheap cull-only dispatch sizes the worklist before
                # the expensive unrolled-leaf compile
                check_cancel(cancel)
                cf = _cull_unrolled_fn(
                    key, T0, n0x, n0y, self.n_inputs, self.interpret
                )
                n_act = int(cf(x0, y0, mat, jnp.float32(z), vec))
                cap = bucket(n_act)
                # record immediately: the warmup="interp" fallback
                # below returns early, and without this every
                # interpreter-served frame would re-pay the sizing
                # dispatch AND a camera pan during the background
                # compile could land in a different bucket, spawning
                # an extra concurrent leaf compile per bucket
                self._ucap[T0] = cap
        else:
            cap = min(int(cap), n0)
        assert warmup in ("block", "interp")
        for _ in range(max_retries + 1):
            check_cancel(cancel)
            fn = _frame_unrolled_fn(
                key, T0, n0x, n0y, cap, self.n_inputs,
                pixel_perfect, self.interpret, cull,
            )
            if warmup == "interp":
                fn = _warm_async(
                    fn, (x0, y0, mat, jnp.float32(z), vec),
                    (key, T0, n0x, n0y, cap, self.n_inputs,
                     pixel_perfect, self.interpret, cull),
                )
                if fn is None:
                    # still compiling in the background: serve this
                    # frame through the shared interpreter pipeline
                    return self.render(
                        world_to_model, z=z, vars=vars,
                        pixel_perfect=pixel_perfect, cancel=cancel,
                    )
            img, fill, n_active = fn(x0, y0, mat, jnp.float32(z), vec)
            if int(n_active) <= cap or cap >= n0:
                break
            cap = bucket(n_active)
        self._ucap[T0] = cap
        return Image2D(
            np.asarray(img)[: self.H, : self.W],
            np.asarray(fill)[: self.H, : self.W],
        )

    def render_dense(
        self,
        world_to_model: np.ndarray | None = None,
        *,
        z: float = 0.0,
        vars: "ShapeVars | dict | None" = None,
    ) -> Image2D:
        """Compiled-per-shape dense render (the fidget `--eval=jit`
        analog): the WHOLE tape unrolls into one XLA program over the
        full pixel grid — no interpreter, no switch, no culling. ~2x
        the MPR pipeline's steady-state throughput on prospero (198 vs
        109 Mpix/s on a v5e) at the cost of a one-time multi-minute
        XLA compile per (shape, size). Every pixel carries a true
        distance (fill is FILL_NONE everywhere), so this is also the
        differentiable path."""
        mat = jnp.asarray(self._mat4(world_to_model))
        vec = jnp.asarray(self._var_vec(vars))
        if self._dense_jit is None:

            def frame(mat, z, var_vec):
                W, H = self.W, self.H
                cols = jnp.broadcast_to(
                    jnp.arange(W, dtype=jnp.float32)[None, :], (H, W)
                )
                rows = jnp.broadcast_to(
                    jnp.arange(H, dtype=jnp.float32)[:, None], (H, W)
                )
                mx, my, mz = self._transform_points(mat, cols, rows, z)
                inputs = [None] * self.n_inputs
                for kind, plane in (("x", mx), ("y", my), ("z", mz)):
                    i = self.axis_of.get(kind)
                    if i is not None:
                        inputs[i] = jnp.broadcast_to(plane, (H, W))
                for i in range(self.n_inputs):
                    if inputs[i] is None:
                        inputs[i] = jnp.broadcast_to(var_vec[i], (H, W))
                (d,) = eval_tape_float_fast(self.tape, inputs)
                return d

            self._dense_jit = jax.jit(frame)
        d = np.asarray(self._dense_jit(mat, jnp.float32(z), vec))
        return Image2D(d, np.zeros((self.H, self.W), np.int8))

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
    tile_size: int | None = None,
    tile_sizes: tuple | None = None,
    pixel_perfect: bool = False,
    interpret: bool | None = None,
) -> Image2D:
    """One-shot 2D render (mirrors fidget_raster::pixel::render)."""
    r = PixelRenderer(
        tape, image_size, tile_size=tile_size, tile_sizes=tile_sizes,
        interpret=interpret,
    )
    return r.render(
        world_to_model, z=z, vars=vars, pixel_perfect=pixel_perfect
    )
