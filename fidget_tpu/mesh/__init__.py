"""Manifold Dual Contouring meshing.

The TPU redesign of the reference's octree mesher (fidget-mesh/src/
{octree,cell,dc,qef}.rs): instead of recursive per-cell workers with
thread-local evaluators, the octree advances as dense batched levels —

1. **Level-synchronous build** — all active cells of one depth are
   interval-evaluated in a single bulk Pallas launch; empty/full cells
   are dropped (they contain no surface) and survivors subdivide 8x
   (octree.rs:521-583 restructured as worklists).
2. **Leaf pass** — unique corner lattice points are deduplicated and
   point-evaluated in one launch; corner signs form the 8-bit MDC mask
   per cell (octree.rs:596-637).
3. **Edge search** — crossing edges are deduplicated across cells and
   refined with the reference's N-ary search: 4 rounds of 16 bulk
   samples each (~17^4 effective resolution, octree.rs:687-767).
4. **Gradients + QEF** — one bulk gradient launch at the intersection
   points; per-vertex QEFs (grouped by the MDC corner-cluster tables)
   are accumulated with segment sums and solved as batched 3x3 SVDs
   with singular-value truncation + mass-point regularization
   (qef.rs:67-80), clamped to cell bounds.
5. **Dual triangulation** — with all surface leaves at max depth, the
   dual walk (dc.rs:11-226) reduces to the uniform dual grid: every
   sign-crossing lattice edge connects its 4 adjacent cell vertices
   into 2 triangles, wound by the edge's sign direction.

Topology-safe cell collapse (octree.rs:248-440) runs as a host-side
post-pass (`Settings.collapse`, default True → `collapse.py`): Ju'02
27-point topology predicates plus the reference's 2x merged-QEF error
bound drive a graded adaptive dual walk. With `collapse=False` every
surface cell stays at max depth, which MDC handles manifoldly by
construction.

Known topology caveat (shared with the reference): an *ambiguous face*
— alternating corner signs, so all 4 of its lattice edges cross — whose
two adjacent cells each cluster to a single vertex pinches the surface:
that vertex pair is a quad side once per crossing edge, i.e. 4 times
(2 per direction; 3 when one ring quad is dropped at the open volume
boundary). The reference's dual walk emits the identical topology (same
Nielson clustering per fidget-mesh/build.rs, same quad-per-crossing-edge
emission per dc.rs:11-226); its manifold tests never instantiate an
ambiguous face. Resolving the pinch requires face-sample-dependent
vertex splitting (MC33-style), which neither implementation performs.
"""

from __future__ import annotations

import functools
import os
import struct
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..compiler.tape import Tape
from ..eval.bulk import BulkEvaluator, _lane_block
from ..eval.pallas_interp import interp_float
from ..render.config import check_cancel
from ..shape import Shape, ShapeVars
from .tables import (
    CELL_TO_EDGE_TO_VERT,
    EDGE_AXIS,
    EDGE_HI,
    EDGE_LO,
    VERT_COUNT,
)

__all__ = ["Mesh", "Settings", "build_mesh", "write_obj", "write_stl"]

_EDGE_SAMPLES = 16  # octree.rs: 16 samples ...
_EDGE_ROUNDS = 4  # ... x 4 rounds

#: FIDGET_MESH_TIMING=1 prints per-stage wall times of every build
_TIMING = os.environ.get("FIDGET_MESH_TIMING", "") not in ("", "0")


class _StageClock:
    """Wall-clock stage attribution (device waits land in the stage
    that synchronizes)."""

    def __init__(self, enabled=_TIMING):
        self.enabled = enabled
        self.t = time.perf_counter()

    def tick(self, label):
        if not self.enabled:
            return
        now = time.perf_counter()
        print(f"  [mesh] {label}: {(now - self.t) * 1e3:.1f} ms")
        self.t = now


@dataclass
class Settings:
    """Meshing settings (fidget-mesh/src/lib.rs:84-110 analog).

    collapse enables topology-safe bottom-up cell merging (the
    reference's adaptive octree, octree.rs:248-440): fewer triangles in
    flat regions at the same surface accuracy."""

    depth: int = 5
    world_to_model: np.ndarray | None = None
    vars: ShapeVars | dict | None = None
    collapse: bool = True
    interpret: bool | None = None
    #: "interp" runs cell classify / corner signs / edge search through
    #: the Pallas tape interpreter (zero per-shape compiles).
    #: "unrolled" compiles the whole tape into each core as
    #: straight-line XLA — the meshing analog of the tiled-unrolled
    #: renderers (per-shape compile, no interpreter scan cost).
    #: Gradients at intersections stay on the shared grad kernel.
    eval: str = "interp"
    #: optional CancelToken, polled between octree levels, eval
    #: stages, and collapse size-rounds (the reference polls per cell,
    #: fidget-mesh/src/octree.rs:527-529)
    cancel: object | None = None


@dataclass
class Mesh:
    """An indexed triangle mesh in world coordinates."""

    vertices: np.ndarray = field(
        default_factory=lambda: np.zeros((0, 3), np.float32)
    )
    triangles: np.ndarray = field(
        default_factory=lambda: np.zeros((0, 3), np.int32)
    )

    def write_stl(self, f) -> None:
        write_stl(self, f)

    def write_obj(self, f) -> None:
        write_obj(self, f)


def write_obj(mesh: Mesh, f) -> None:
    """Wavefront OBJ writer (indexed: shared vertices, unlike STL).

    Beyond the reference's STL-only output (fidget-mesh/src/output.rs);
    OBJ keeps the dual-contour vertex sharing on disk, ~40% the size."""
    own = isinstance(f, (str, bytes, os.PathLike))
    fh = open(f, "w") if own else f
    try:
        for v in np.asarray(mesh.vertices, np.float64):
            fh.write(f"v {v[0]:.9g} {v[1]:.9g} {v[2]:.9g}\n")
        for t in np.asarray(mesh.triangles, np.int64) + 1:  # 1-indexed
            fh.write(f"f {t[0]} {t[1]} {t[2]}\n")
    finally:
        if own:
            fh.close()


def write_stl(mesh: Mesh, f) -> None:
    """Binary STL writer (fidget-mesh/src/output.rs:7-40)."""
    own = isinstance(f, (str, bytes, os.PathLike))
    fh = open(f, "wb") if own else f
    try:
        fh.write(b"\x00" * 80)
        tris = mesh.triangles
        fh.write(struct.pack("<I", len(tris)))
        v = mesh.vertices
        a = v[tris[:, 0]]
        b = v[tris[:, 1]]
        c = v[tris[:, 2]]
        n = np.cross(b - a, c - a)
        ln = np.linalg.norm(n, axis=1, keepdims=True)
        n = np.where(ln > 0, n / np.maximum(ln, 1e-30), 0.0)
        rec = np.zeros((len(tris), 12), "<f4")
        rec[:, 0:3] = n
        rec[:, 3:6] = a
        rec[:, 6:9] = b
        rec[:, 9:12] = c
        buf = np.zeros(len(tris), dtype=[("d", "<f4", 12), ("attr", "<u2")])
        buf["d"] = rec
        fh.write(buf.tobytes())
    finally:
        if own:
            fh.close()


# ---------------------------------------------------------------------------


def _mat_and_vars(tape_or_shape, settings):
    shape_t = None
    if isinstance(tape_or_shape, Shape):
        shape_t = tape_or_shape.transform
        tape = tape_or_shape.tape()
    else:
        tape = tape_or_shape
    m = np.eye(4) if settings.world_to_model is None else np.asarray(
        settings.world_to_model, np.float64
    )
    if shape_t is not None:
        m = shape_t @ m
    if not np.allclose(m[3], [0, 0, 0, 1]):
        raise NotImplementedError("meshing requires an affine transform")
    vec = np.zeros(max(1, len(tape.var_map)), np.float32)
    vars = settings.vars
    missing = []
    for v, i in tape.var_map.items():
        if v.kind == "v":
            if vars is not None and v in vars:
                vec[i] = np.float32(vars[v])
            else:
                missing.append(v)
    if missing:
        raise ValueError(f"unbound shape variables: {missing}")
    return tape, m.astype(np.float64), vec[: len(tape.var_map)]


def _xform(m, pts):
    """Affine world -> model on [N, 3] (float32 to halve traffic)."""
    m = m.astype(np.float32)
    return pts.astype(np.float32) @ m[:3, :3].T + m[:3, 3]


def _bucket(n_lanes: int, s0: int):
    """(T, used) power-of-two instance bucket covering n_lanes."""
    used = -(-max(1, n_lanes) // (s0 * 128))
    T = 1 << (used - 1).bit_length()
    return T, used


def _vvec(ev, var_vec):
    v = np.zeros(ev.n_inputs, np.float32)
    v[: len(var_vec)] = var_vec
    return v


def _axis_idx(ev):
    return tuple(
        -1 if ev.axis_of.get(k) is None else ev.axis_of[k]
        for k in ("x", "y", "z")
    )


def _tape_args(ev):
    p = ev.packed
    return (
        jnp.asarray(p.w1), jnp.asarray(p.w2), jnp.asarray(p.imm),
        jnp.asarray(p.lengths),
    )


@functools.partial(
    jax.jit,
    static_argnames=("T", "s0", "nf", "V", "axis_idx", "c_words", "interpret", "op_order"),
)
def _classify_cells_core(
    w1, w2, imm, lengths, cells, hsize, pos, neg, off, var_vec, used, *,
    T, s0, nf, V, axis_idx, c_words, interpret, op_order=None,
):
    """Interval-classifies octree cells fully device-side.

    cells: [Npad, 3] i32 lattice coords at the current depth (Npad ==
    T*s0*128); hsize: cell edge in world units. The cell box maps
    through the affine transform with the positive/negative coefficient
    split (exact box bounds), then one interval launch classifies every
    cell. Only 12 B/cell go up and 1 B/cell comes back.
    """
    from ..eval.pallas_interp import interp_interval

    wlo = cells.astype(jnp.float32) * hsize - 1.0
    whi = wlo + hsize
    mlo = wlo @ pos.T + whi @ neg.T + off
    mhi = whi @ pos.T + wlo @ neg.T + off
    lens = jnp.broadcast_to(lengths, (T,))
    lens = jnp.where(jnp.arange(T) < used, lens, 0)
    w1b = jnp.broadcast_to(w1, (T,) + w1.shape[1:])
    w2b = jnp.broadcast_to(w2, (T,) + w2.shape[1:])
    immb = jnp.broadcast_to(imm, (T,) + imm.shape[1:])
    var_lo = jnp.broadcast_to(
        var_vec[None, :, None, None], (T, V, s0, 128)
    ).astype(jnp.float32)
    var_hi = var_lo
    for k in range(3):
        if axis_idx[k] >= 0:
            var_lo = var_lo.at[:, axis_idx[k]].set(
                mlo[:, k].reshape(T, s0, 128)
            )
            var_hi = var_hi.at[:, axis_idx[k]].set(
                mhi[:, k].reshape(T, s0, 128)
            )
    olo, ohi, _ = interp_interval(
        w1b, w2b, immb, lens, var_lo, var_hi,
        nf=nf, n_inputs=V, n_outputs=1, s0=s0, c_words=c_words,
        interpret=interpret, op_order=op_order,
    )
    lo = olo[:, 0].reshape(-1)
    hi = ohi[:, 0].reshape(-1)
    return ~((lo > 0.0) | (hi < 0.0))


def _classify_cells(ev, cells, h, m, var_vec):
    """np [N] bool: cells (lattice coords, edge h) not provably
    empty/full under world->model transform m."""
    N = len(cells)
    if getattr(ev, "unrolled", False):
        Npad = 1 << max(0, (N - 1).bit_length())
        cpad = np.zeros((Npad, 3), np.int32)
        cpad[:N] = cells
        A = m[:3, :3].astype(np.float32)
        core = _u_jit(ev, "classify", lambda: _u_classify_core(ev))
        act = core(
            jnp.asarray(np.ascontiguousarray(cpad.T)), jnp.float32(h),
            jnp.asarray(np.maximum(A, 0.0)),
            jnp.asarray(np.minimum(A, 0.0)),
            jnp.asarray(m[:3, 3].astype(np.float32)),
            jnp.asarray(_vvec(ev, var_vec)),
        )
        return np.asarray(act)[:N]
    s0 = _lane_block(ev.nf, 2)
    T, used = _bucket(N, s0)
    Npad = T * s0 * 128
    cpad = np.zeros((Npad, 3), np.int32)
    cpad[:N] = cells
    A = m[:3, :3].astype(np.float32)
    act = _classify_cells_core(
        *_tape_args(ev),
        jnp.asarray(cpad), jnp.float32(h),
        jnp.asarray(np.maximum(A, 0.0)), jnp.asarray(np.minimum(A, 0.0)),
        jnp.asarray(m[:3, 3].astype(np.float32)),
        jnp.asarray(_vvec(ev, var_vec)), jnp.int32(used),
        T=T, s0=s0, nf=ev.nf, V=ev.n_inputs, axis_idx=_axis_idx(ev),
        c_words=ev.c_words, interpret=ev.interpret, op_order=ev.op_order,
    )
    return np.asarray(act)[:N]


@functools.partial(
    jax.jit,
    static_argnames=("T", "s0", "nf", "V", "axis_idx", "interpret", "op_order"),
)
def _corner_signs_core(
    w1, w2, imm, lengths, keys, stride, hsize, mat, var_vec, used, *,
    T, s0, nf, V, axis_idx, interpret, op_order=None,
):
    """Point signs at lattice corners decoded from int32 keys on
    device: key = (x*(G+1) + y)*(G+1) + z. Upload 4 B/corner, download
    1 B/corner."""
    kx = keys // (stride * stride)
    ky = (keys // stride) % stride
    kz = keys % stride
    pts = jnp.stack([kx, ky, kz], axis=-1).astype(jnp.float32) * hsize - 1.0
    mp = pts @ mat[:, :3].T + mat[:, 3]
    lens = jnp.broadcast_to(lengths, (T,))
    lens = jnp.where(jnp.arange(T) < used, lens, 0)
    w1b = jnp.broadcast_to(w1, (T,) + w1.shape[1:])
    w2b = jnp.broadcast_to(w2, (T,) + w2.shape[1:])
    immb = jnp.broadcast_to(imm, (T,) + imm.shape[1:])
    vars_ = jnp.broadcast_to(
        var_vec[None, :, None, None], (T, V, s0, 128)
    ).astype(jnp.float32)
    for k in range(3):
        if axis_idx[k] >= 0:
            vars_ = vars_.at[:, axis_idx[k]].set(
                mp[:, k].reshape(T, s0, 128)
            )
    out = interp_float(
        w1b, w2b, immb, lens, vars_,
        nf=nf, n_inputs=V, n_outputs=1, s0=s0, interpret=interpret,
        op_order=op_order,
    )[:, 0]
    return (out < 0.0).reshape(-1)


def _corner_signs(ev, uniq, G, h, m, var_vec):
    """np [U] bool inside-signs for unique corner-lattice keys."""
    U = len(uniq)
    if getattr(ev, "unrolled", False):
        Upad = 1 << max(0, (U - 1).bit_length())
        kpad = np.zeros(Upad, np.int32)
        kpad[:U] = uniq.astype(np.int32)
        core = _u_jit(ev, "corners", lambda: _u_corner_core(ev))
        signs = core(
            jnp.asarray(kpad), jnp.int32(G + 1), jnp.float32(h),
            jnp.asarray(m[:3, :].astype(np.float32)),
            jnp.asarray(_vvec(ev, var_vec)),
        )
        return np.asarray(signs)[:U]
    s0 = _lane_block(ev.nf, 1)
    T, used = _bucket(U, s0)
    Upad = T * s0 * 128
    kpad = np.zeros(Upad, np.int32)
    kpad[:U] = uniq.astype(np.int32)
    signs = _corner_signs_core(
        *_tape_args(ev),
        jnp.asarray(kpad), jnp.int32(G + 1), jnp.float32(h),
        jnp.asarray(m[:3, :].astype(np.float32)),
        jnp.asarray(_vvec(ev, var_vec)), jnp.int32(used),
        T=T, s0=s0, nf=ev.nf, V=ev.n_inputs, axis_idx=_axis_idx(ev),
        interpret=ev.interpret, op_order=ev.op_order,
    )
    return np.asarray(signs)[:U]


@functools.partial(
    jax.jit,
    static_argnames=("T", "s0", "nf", "V", "axis_idx", "interpret", "op_order"),
)
def _offset_signs_core(
    w1, w2, imm, lengths, base, offsets, scale, hsize, mat, var_vec,
    used, *, T, s0, nf, V, axis_idx, interpret, op_order=None,
):
    """Point signs at base[i] + offsets[j] * scale lattice points,
    decoded device-side: upload 12 B/base instead of
    12 B * len(offsets) (the collapse loop's 27-point sign lattice).

    base: [Cpad, 3] i32; offsets: [K, 3] i32 (static table uploaded
    once per shape); returns [Cpad*K] bool, j-major within each i.
    """
    pts = (
        base[:, None, :] + offsets[None, :, :] * scale
    ).reshape(-1, 3).astype(jnp.float32) * hsize - 1.0
    mp = pts @ mat[:, :3].T + mat[:, 3]
    lanes = T * s0 * 128
    mp = jnp.pad(mp, ((0, lanes - mp.shape[0]), (0, 0)))
    lens = jnp.broadcast_to(lengths, (T,))
    lens = jnp.where(jnp.arange(T) < used, lens, 0)
    w1b = jnp.broadcast_to(w1, (T,) + w1.shape[1:])
    w2b = jnp.broadcast_to(w2, (T,) + w2.shape[1:])
    immb = jnp.broadcast_to(imm, (T,) + imm.shape[1:])
    vars_ = jnp.broadcast_to(
        var_vec[None, :, None, None], (T, V, s0, 128)
    ).astype(jnp.float32)
    for k in range(3):
        if axis_idx[k] >= 0:
            vars_ = vars_.at[:, axis_idx[k]].set(
                mp[:, k].reshape(T, s0, 128)
            )
    out = interp_float(
        w1b, w2b, immb, lens, vars_,
        nf=nf, n_inputs=V, n_outputs=1, s0=s0, interpret=interpret,
        op_order=op_order,
    )[:, 0]
    return (out < 0.0).reshape(-1)[: base.shape[0] * offsets.shape[0]]


def offset_signs(ev, base, offsets, scale, h, m, var_vec):
    """np [C, K] bool inside-signs at base + offsets*scale (lattice
    units, cell edge h, world->model m). The base list is padded to a
    power of two so the jit cache stays small across rounds."""
    C = len(base)
    K = len(offsets)
    if getattr(ev, "unrolled", False):
        # device-side decode like the interp core: upload 12 B/base
        # (int32 lattice coords, component-major) and build the C*K
        # model points on device — the host einsum over C*27 points
        # was ~0.4 s of a depth-8 collapse
        Cpad = 1 << max(0, (C - 1).bit_length())
        bpad = np.zeros((3, Cpad), np.int32)
        bpad[:, :C] = np.asarray(base).T
        core = _u_jit(
            ev, ("offsets",) + tuple(map(tuple, np.asarray(offsets))),
            lambda: _u_offset_signs_core(ev, np.asarray(offsets, np.int32)),
        )
        signs = core(
            jnp.asarray(bpad), jnp.int32(scale), jnp.float32(h),
            jnp.asarray(m[:3, :].astype(np.float32)),
            jnp.asarray(_vvec(ev, var_vec)),
        )
        return np.asarray(signs)[:C]
    s0 = _lane_block(ev.nf, 1)
    Cpad = 1 << max(0, (C - 1).bit_length())
    T, used = _bucket(Cpad * K, s0)
    bpad = np.zeros((Cpad, 3), np.int32)
    bpad[:C] = base
    signs = _offset_signs_core(
        *_tape_args(ev),
        jnp.asarray(bpad), jnp.asarray(np.asarray(offsets, np.int32)),
        jnp.int32(scale), jnp.float32(h),
        jnp.asarray(m[:3, :].astype(np.float32)),
        jnp.asarray(_vvec(ev, var_vec)), jnp.int32(used),
        T=T, s0=s0, nf=ev.nf, V=ev.n_inputs, axis_idx=_axis_idx(ev),
        interpret=ev.interpret, op_order=ev.op_order,
    )
    return np.asarray(signs)[: C * K].reshape(C, K)


# ----------------------------------------------------------------------
# unrolled evaluation cores (Settings(eval="unrolled")): the whole tape
# as straight-line XLA instead of the Pallas interpreter — the meshing
# analog of the tiled-unrolled renderers. One jitted core per evaluator
# instance; callers pad to powers of two so jit variants stay bounded.


def _u_jit(ev, key, build):
    cache = ev.__dict__.setdefault("_u_cores", {})
    if key not in cache:
        cache[key] = build()
    return cache[key]


def _u_float_inputs(ev, comps, var_vec_, shape):
    """(mx, my, mz) model-coord planes -> per-tape-input arrays.

    All planes share `shape` and the tape chain evaluates IN that
    shape: no mid-graph reshape/slice may sit between the coordinate
    math and the chain or XLA:TPU stops fusing across it and
    materializes one HBM buffer per tape op (the round-3 8x renderer
    regression; demos/exp_leaf_bisect.py)."""
    inputs = [
        jnp.broadcast_to(var_vec_[i], shape).astype(jnp.float32)
        for i in range(ev.n_inputs)
    ]
    for k, kind in enumerate(("x", "y", "z")):
        idx = ev.axis_of.get(kind)
        if idx is not None:
            inputs[idx] = comps[k]
    return inputs


def _u_offset_signs_core(ev, offsets):
    """offset_signs' unrolled core: device-side lattice decode +
    whole-tape point eval at [K, C] (offsets on sublanes, bases on the
    dense 128-lane axis)."""
    from ..eval.unrolled_fast import eval_tape_float_fast

    offs = [
        jnp.asarray(offsets[:, k].astype(np.float32))[:, None]
        for k in range(3)
    ]
    K = len(offsets)

    def core(b3, scale, h, mat, var_vec_):
        s = scale.astype(jnp.float32)
        f = [
            (b3[k].astype(jnp.float32)[None, :] + offs[k] * s) * h - 1.0
            for k in range(3)
        ]
        comps = tuple(
            mat[r, 0] * f[0] + mat[r, 1] * f[1] + mat[r, 2] * f[2]
            + mat[r, 3]
            for r in range(3)
        )
        out = eval_tape_float_fast(
            ev.tape,
            _u_float_inputs(ev, comps, var_vec_, (K, b3.shape[1])),
        )
        return (out[0] < 0.0).T

    return jax.jit(core)


def _u_classify_core(ev):
    from ..eval.unrolled_fast import eval_tape_interval_fast

    def core(cells3, hsize, pos, neg, off, var_vec_):
        # cells3: [3, L] (component-major upload: row slices of an
        # input are contiguous; a [L, 3] column slice is strided).
        # Interval transform written componentwise — a [L,3]x[3,3]
        # matmul pads K=3 onto the MXU and its column slices un-fuse
        # the chain.
        w_lo = [cells3[k].astype(jnp.float32) * hsize - 1.0
                for k in range(3)]
        w_hi = [w + hsize for w in w_lo]
        L = cells3.shape[1]
        inputs = [
            (
                jnp.broadcast_to(var_vec_[i], (L,)).astype(jnp.float32),
            ) * 2
            for i in range(ev.n_inputs)
        ]
        for k, kind in enumerate(("x", "y", "z")):
            idx = ev.axis_of.get(kind)
            if idx is not None:
                mlo = off[k] + sum(
                    pos[k, j] * w_lo[j] + neg[k, j] * w_hi[j]
                    for j in range(3)
                )
                mhi = off[k] + sum(
                    pos[k, j] * w_hi[j] + neg[k, j] * w_lo[j]
                    for j in range(3)
                )
                inputs[idx] = (mlo, mhi)
        los, his = eval_tape_interval_fast(ev.tape, inputs)
        return ~((los[0] > 0.0) | (his[0] < 0.0))

    return jax.jit(core)


def _u_points_core(ev):
    from ..eval.unrolled_fast import eval_tape_float_fast

    def core(mp3, var_vec_):
        # mp3: [3, L] component-major model coords
        comps = (mp3[0], mp3[1], mp3[2])
        out = eval_tape_float_fast(
            ev.tape, _u_float_inputs(ev, comps, var_vec_, mp3.shape[1:])
        )
        return out[0] < 0.0

    return jax.jit(core)


def _u_corner_core(ev):
    """Corner-key decode + whole-tape point eval, all device-side
    (upload 4 B/corner like the interpreter core)."""
    from ..eval.unrolled_fast import eval_tape_float_fast

    def core(keys, stride, hsize, mat, var_vec_):
        kx = keys // (stride * stride)
        ky = (keys // stride) % stride
        kz = keys % stride
        f = [
            k.astype(jnp.float32) * hsize - 1.0 for k in (kx, ky, kz)
        ]
        comps = tuple(
            mat[r, 0] * f[0] + mat[r, 1] * f[1] + mat[r, 2] * f[2]
            + mat[r, 3]
            for r in range(3)
        )
        out = eval_tape_float_fast(
            ev.tape, _u_float_inputs(ev, comps, var_vec_, keys.shape)
        )
        return out[0] < 0.0

    return jax.jit(core)


def _u_edge_search_core(ev, rounds, samples):
    from ..eval.unrolled_fast import eval_tape_float_fast

    def core(p_start, p_end, mat, var_vec_):
        E = p_start.shape[0]
        S = samples
        # [S, E] layout: edges ride the 128-lane minor axis densely;
        # sample index is the 8-sublane axis. Bracket sample positions
        # are recomputed arithmetically (ts(k) = ta + (tb-ta)(k+1)/(S+1))
        # instead of take_along_axis gathers.
        frac = (
            (jnp.arange(S, dtype=jnp.float32) + 1.0) / (S + 1.0)
        )[:, None]
        sxyz = [p_start[:, k] for k in range(3)]
        dxyz = [p_end[:, k] - p_start[:, k] for k in range(3)]

        def round_(_, carry):
            ta, tb = carry
            ts = ta[None, :] + (tb - ta)[None, :] * frac      # [S, E]
            p = [
                sxyz[k][None, :] + dxyz[k][None, :] * ts for k in range(3)
            ]
            comps = tuple(
                mat[r, 0] * p[0] + mat[r, 1] * p[1] + mat[r, 2] * p[2]
                + mat[r, 3]
                for r in range(3)
            )
            out = eval_tape_float_fast(
                ev.tape, _u_float_inputs(ev, comps, var_vec_, (S, E))
            )[0]
            outside = ~(out < 0.0)                            # [S, E]
            any_out = outside.any(axis=0)
            F = jnp.argmax(outside, axis=0).astype(jnp.float32)
            span = tb - ta
            tbF = ta + span * (F + 1.0) / (S + 1.0)
            taF = ta + span * F / (S + 1.0)
            ts_last = ta + span * S / (S + 1.0)
            new_tb = jnp.where(any_out, tbF, tb)
            new_ta = jnp.where(
                any_out & (F > 0), taF,
                jnp.where(any_out, ta, ts_last),
            )
            return new_ta, new_tb

        ta0 = jnp.zeros(E, jnp.float32)
        tb0 = jnp.ones(E, jnp.float32)
        ta, tb = jax.lax.fori_loop(0, rounds, round_, (ta0, tb0))
        return 0.5 * (ta + tb)

    return jax.jit(core)


@functools.partial(
    jax.jit,
    static_argnames=(
        "T", "s0", "nf", "V", "axis_idx", "rounds", "samples", "interpret",
        "op_order",
    ),
)
def _edge_search_core(
    w1, w2, imm, lengths, p_start, p_end, mat, var_vec, used, *,
    T, s0, nf, V, axis_idx, rounds, samples, interpret, op_order=None,
):
    """Device-resident N-ary edge search (octree.rs:687-767).

    Runs all `rounds` bisection rounds inside one XLA program: per
    round, `samples` points along each [ta, tb] bracket are float-
    evaluated and the bracket tightens on the first inside->outside
    flip. Only the endpoints go up (24 B/edge) and only t* comes back
    (4 B/edge) — the per-round point uploads / sign downloads of a
    host-side loop cost ~33x more tunnel traffic.

    p_start/p_end: [Epad, 3] f32 world endpoints (start inside, end
    outside); mat: [3, 4] affine world->model; Epad * samples ==
    T * s0 * 128. Returns t* [Epad] f32.
    """
    E = p_start.shape[0]
    frac = (jnp.arange(samples, dtype=jnp.float32) + 1.0) / (samples + 1.0)
    lens = jnp.broadcast_to(lengths, (T,))
    lens = jnp.where(jnp.arange(T) < used, lens, 0)
    w1b = jnp.broadcast_to(w1, (T,) + w1.shape[1:])
    w2b = jnp.broadcast_to(w2, (T,) + w2.shape[1:])
    immb = jnp.broadcast_to(imm, (T,) + imm.shape[1:])
    d = p_end - p_start

    def round_(_, carry):
        ta, tb = carry
        ts = ta[:, None] + (tb - ta)[:, None] * frac[None, :]  # [E, S]
        pts = p_start[:, None, :] + d[:, None, :] * ts[..., None]
        mp = pts @ mat[:, :3].T + mat[:, 3]  # [E, S, 3] model coords
        vars_ = jnp.broadcast_to(
            var_vec[None, :, None, None], (T, V, s0, 128)
        ).astype(jnp.float32)
        for k in range(3):
            if axis_idx[k] >= 0:
                vars_ = vars_.at[:, axis_idx[k]].set(
                    mp[..., k].reshape(T, s0, 128)
                )
        out = interp_float(
            w1b, w2b, immb, lens, vars_,
            nf=nf, n_inputs=V, n_outputs=1, s0=s0, interpret=interpret,
            op_order=op_order,
        )[:, 0]
        inside = (out < 0.0).reshape(E, samples)
        outside = ~inside
        any_out = outside.any(axis=1)
        F = jnp.argmax(outside, axis=1)
        tbF = jnp.take_along_axis(ts, F[:, None], 1)[:, 0]
        tb = jnp.where(any_out, tbF, tb)
        prev = jnp.maximum(F - 1, 0)
        taF = jnp.take_along_axis(ts, prev[:, None], 1)[:, 0]
        ta = jnp.where(
            any_out & (F > 0), taF,
            jnp.where(any_out, ta, ts[:, -1]),  # all inside: advance ta
        )
        return ta, tb

    ta0 = jnp.zeros(E, jnp.float32)
    tb0 = jnp.ones(E, jnp.float32)
    ta, tb = jax.lax.fori_loop(0, rounds, round_, (ta0, tb0))
    return 0.5 * (ta + tb)


#: evaluator cache: repeat builds of the same tape (viewer reload,
#: parameter fitting, benchmarks) must reuse one BulkEvaluator so its
#: jitted cores — especially the per-shape unrolled XLA cores — stay
#: warm; a fresh evaluator per build re-jits every core (measured:
#: 23.8 s "warm" unrolled colonnade depth-8 from persistent-cache
#: reloads alone). Values pin their tape, keeping the id key stable.
_EV_CACHE: dict = {}
_EV_CACHE_CAP = 16


def _get_evaluator(tape, interpret, unrolled):
    key = (id(tape), bool(interpret), bool(unrolled))
    ev = _EV_CACHE.get(key)
    if ev is None:
        while len(_EV_CACHE) >= _EV_CACHE_CAP:
            _EV_CACHE.pop(next(iter(_EV_CACHE)))
        ev = BulkEvaluator(tape, interpret=interpret)
        ev.unrolled = unrolled
        ev._pinned_tape = tape
        _EV_CACHE[key] = ev
    return ev


def build_mesh(tape: Tape | Shape, settings: Settings | None = None) -> Mesh:
    """Builds an MDC mesh of the surface inside the world ±1 cube.

    >>> from fidget_tpu import Shape, Tree
    >>> from fidget_tpu.mesh import Settings, build_mesh
    >>> x, y, z = Tree.axes()
    >>> s = Shape.from_tree(
    ...     (x.square() + y.square() + z.square()).sqrt() - 0.6
    ... )
    >>> m = build_mesh(s, Settings(depth=3, interpret=True))
    >>> len(m.triangles) > 0 and m.vertices.shape[1] == 3
    True
    """
    settings = settings or Settings()
    if settings.eval not in ("interp", "unrolled"):
        raise ValueError(
            f"Settings.eval must be 'interp' or 'unrolled', got "
            f"{settings.eval!r}"
        )
    if not 0 < settings.depth <= 10:
        # corner-lattice keys (x*(G+1)+y)*(G+1)+z ride int32 through
        # the device kernels: depth 10 (G=1024) peaks at ~1.08e9 < 2^31;
        # depth 11 would silently wrap negative and corrupt the mesh
        raise ValueError(
            f"Settings.depth must be in 1..10 (int32 lattice keys), "
            f"got {settings.depth}"
        )
    tape, m, var_vec = _mat_and_vars(tape, settings)
    ev = _get_evaluator(tape, settings.interpret, settings.eval == "unrolled")
    clock = _StageClock()
    depth = settings.depth
    G = 1 << depth  # leaf grid resolution per axis
    h_leaf = 2.0 / G

    if settings.eval == "unrolled":
        return _build_mesh_fused(ev, m, var_vec, settings, clock)

    # ---- stage 1: level-synchronous interval build ----------------------
    # cells go up as int32 lattice coords; the exact box transform and
    # interval classification run device-side (_classify_cells_core)
    # Levels 0-3 hold at most 585 cells total but cost one ~30 ms
    # dispatch+sync round trip each: start directly from the dense
    # 16^3 grid at depth 4 (one classify dispatch covers what four
    # sequential ones did; interval proofs are per-cell, so pruning is
    # unaffected).
    d_start = 4 if depth > 4 else 0
    if d_start:
        g0 = np.arange(1 << d_start, dtype=np.int64)
        cells = np.stack(
            np.meshgrid(g0, g0, g0, indexing="ij"), axis=-1
        ).reshape(-1, 3)
    else:
        cells = np.zeros((1, 3), np.int64)  # coords at current depth
    for d in range(d_start, depth):
        check_cancel(settings.cancel)
        h = 2.0 / (1 << d)
        active = _classify_cells(ev, cells, h, m, var_vec)
        cells = cells[active]
        clock.tick(f"classify d={d} ({len(cells)} active)")
        if len(cells) == 0:
            return Mesh()
        # subdivide x8
        off = np.array(
            [[i, j, k] for k in (0, 1) for j in (0, 1) for i in (0, 1)],
            np.int64,
        )
        cells = (cells[:, None, :] * 2 + off[None, :, :]).reshape(-1, 3)

    # final leaf-level cull
    check_cancel(settings.cancel)
    h = h_leaf
    active = _classify_cells(ev, cells, h, m, var_vec)
    cells = cells[active]
    clock.tick(f"classify leaf ({len(cells)} active)")
    if len(cells) == 0:
        return Mesh()
    N = len(cells)

    # ---- stage 2: deduplicated corner evaluation -------------------------
    corner_off = np.array(
        [[(c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1] for c in range(8)],
        np.int64,
    )
    corners = cells[:, None, :] + corner_off[None, :, :]  # [N, 8, 3]
    ckeys = (
        corners[..., 0] * (G + 1) + corners[..., 1]
    ) * (G + 1) + corners[..., 2]
    uniq, inv = np.unique(ckeys.reshape(-1), return_inverse=True)
    usigns = _corner_signs(ev, uniq, G, h, m, var_vec)
    clock.tick(f"corner signs ({len(uniq)} unique)")
    csigns = usigns[inv].reshape(N, 8)
    mask = (csigns << np.arange(8)[None, :]).sum(axis=1).astype(np.int32)
    surf = (mask != 0) & (mask != 255)
    cells, mask = cells[surf], mask[surf]
    N = len(cells)
    if N == 0:
        return Mesh()

    # ---- stage 3: crossing-edge dedup + N-ary search ----------------------
    crossing = CELL_TO_EDGE_TO_VERT[mask] >= 0  # [N, 12]
    ci, ei = np.nonzero(crossing)
    # canonical edge key: (axis, lattice coords of the edge's lo corner)
    lo_corner = cells[ci] + corner_off[EDGE_LO[ei]]
    ekeys = (
        (EDGE_AXIS[ei].astype(np.int64) * (G + 1)
         + lo_corner[:, 0]) * (G + 1) + lo_corner[:, 1]
    ) * (G + 1) + lo_corner[:, 2]
    check_cancel(settings.cancel)
    ukeys, einv = np.unique(ekeys, return_inverse=True)
    first = np.full(len(ukeys), np.iinfo(np.int64).max, np.int64)
    np.minimum.at(first, einv, np.arange(len(einv)))
    rep_ci, rep_ei = ci[first], ei[first]
    E = len(ukeys)
    # directed endpoints: start inside (<0), end outside (>= 0)
    lo_c = EDGE_LO[rep_ei]
    hi_c = EDGE_HI[rep_ei]
    lo_in = (mask[rep_ci] >> lo_c) & 1
    start_c = np.where(lo_in == 1, lo_c, hi_c)
    end_c = np.where(lo_in == 1, hi_c, lo_c)
    p_start = (cells[rep_ci] + corner_off[start_c]) * h - 1.0
    p_end = (cells[rep_ci] + corner_off[end_c]) * h - 1.0
    # all bisection rounds run device-side in one XLA program; the
    # bracket invariant (start inside, end outside) and the first-flip
    # rule match octree.rs:687-767 exactly
    if getattr(ev, "unrolled", False):
        Epad = 1 << max(0, (E - 1).bit_length())

        def padf(a):
            return np.pad(a.astype(np.float32), ((0, Epad - E), (0, 0)))

        core = _u_jit(
            ev, "edge_search",
            lambda: _u_edge_search_core(ev, _EDGE_ROUNDS, _EDGE_SAMPLES),
        )
        t_star = np.asarray(
            core(
                jnp.asarray(padf(p_start)), jnp.asarray(padf(p_end)),
                jnp.asarray(m[:3, :].astype(np.float32)),
                jnp.asarray(_vvec(ev, var_vec)),
            )
        )[:E].astype(np.float64)
    else:
        s0e = _lane_block(ev.nf, 1)
        T, used = _bucket(E * _EDGE_SAMPLES, s0e)
        Epad = T * s0e * 128 // _EDGE_SAMPLES
        pad = Epad - E

        def padf(a):
            return np.pad(a.astype(np.float32), ((0, pad), (0, 0)))

        t_star = np.asarray(
            _edge_search_core(
                *_tape_args(ev),
                jnp.asarray(padf(p_start)), jnp.asarray(padf(p_end)),
                jnp.asarray(m[:3, :].astype(np.float32)),
                jnp.asarray(_vvec(ev, var_vec)), jnp.int32(used),
                T=T, s0=s0e, nf=ev.nf, V=ev.n_inputs,
                axis_idx=_axis_idx(ev),
                rounds=_EDGE_ROUNDS, samples=_EDGE_SAMPLES,
                interpret=ev.interpret, op_order=ev.op_order,
            )
        )[:E].astype(np.float64)
    ipts = p_start + (p_end - p_start) * t_star[:, None]  # world coords [E,3]
    clock.tick(f"edge search ({E} edges)")

    # ---- stage 4: gradients + per-vertex QEF ------------------------------
    mip = _xform(m, ipts)
    g = ev.eval_grad(mip[:, 0], mip[:, 1], mip[:, 2], var_vec)[0]
    clock.tick("gradients")
    grads_model = g[1:4].T  # [E, 3]
    grads = grads_model @ m[:3, :3]  # chain rule: d/d(world) = J^T g
    bad = ~np.isfinite(grads).all(axis=1)
    gn = np.linalg.norm(grads, axis=1, keepdims=True)
    normals = np.where(
        bad[:, None] | (gn < 1e-20), 0.0, grads / np.maximum(gn, 1e-20)
    )

    # global vertex ids: per-cell offset + local MDC vertex index
    nvert = VERT_COUNT[mask]
    voff = np.concatenate([[0], np.cumsum(nvert)]).astype(np.int64)
    NV = int(voff[-1])
    vid = voff[ci] + CELL_TO_EDGE_TO_VERT[mask[ci], ei]  # per (cell, edge)
    e_of = einv  # unique-edge id per (cell, edge) instance

    pt = ipts[e_of]
    nm = normals[e_of]
    w = np.isfinite(nm).all(axis=1) & (np.linalg.norm(nm, axis=1) > 0)

    # segment-sum: one native C++ pass when available (the host is
    # single-core; 14 numpy bincount passes measured ~220 ms at
    # depth-8 edge counts), bincount fallback otherwise (~10x faster
    # than the unbuffered np.add.at either way)
    from .. import native

    acc = native.qef_accumulate_batch(vid, pt, nm, w, NV)
    if acc is not None:
        msum = acc[:, 0:3]
        mcnt = acc[:, 3]
        AtA = np.empty((NV, 3, 3))
        AtA[:, 0, 0] = acc[:, 4]
        AtA[:, 0, 1] = AtA[:, 1, 0] = acc[:, 5]
        AtA[:, 0, 2] = AtA[:, 2, 0] = acc[:, 6]
        AtA[:, 1, 1] = acc[:, 7]
        AtA[:, 1, 2] = AtA[:, 2, 1] = acc[:, 8]
        AtA[:, 2, 2] = acc[:, 9]
        Atb = acc[:, 10:13]
        btb = acc[:, 13]
    else:
        def vsum(vals):
            return np.bincount(vid, weights=vals, minlength=NV)

        msum = np.stack([vsum(pt[:, k]) for k in range(3)], axis=1)
        mcnt = np.bincount(vid, minlength=NV).astype(np.float64)
        nw = np.where(w[:, None], nm, 0.0)
        bw = (nw * pt).sum(axis=1)
        AtA = np.empty((NV, 3, 3))
        for i in range(3):
            for j in range(i, 3):
                AtA[:, i, j] = AtA[:, j, i] = vsum(nw[:, i] * nw[:, j])
        Atb = np.stack([vsum(nw[:, k] * bw) for k in range(3)], axis=1)
        btb = vsum(bw * bw)
    mass = msum / np.maximum(mcnt, 1.0)[:, None]

    # batched truncated-SVD solve about the mass point (qef.rs:67-80) —
    # the shared helper falls back to the (in-cell) mass point on a
    # non-finite solution, so clamping after is always well-defined
    from .collapse import _solve_qef

    vpos = _solve_qef(AtA, Atb, mass)
    # clamp to the owning cell's bounds (one leaf cell per vertex)
    cell_of_vert = np.repeat(np.arange(N), nvert)
    clo = cells[cell_of_vert] * h - 1.0
    vpos = np.clip(vpos, clo, clo + h)
    clock.tick(f"QEF accumulate+solve ({NV} verts)")

    return _assemble_mesh(
        ev, m, var_vec, settings, clock, G, h, cells, mask, nvert, voff,
        AtA, Atb, btb, msum, mcnt, vpos, crossing,
    )


def _build_mesh_fused(ev, m, var_vec, settings, clock):
    """build_mesh body for Settings(eval="unrolled"): the device-
    resident fine pipeline (mesh/fused.py) replaces the staged
    classify / corner / edge-search / gradient dispatches, and the
    collapse runs against the DeviceVertexStore so per-vertex QEF data
    never crosses the tunnel — only cell keys, masks, and per-round
    candidate results do."""
    from .collapse import collapse_and_walk
    from .fused import DeviceVertexStore, fine_stage

    depth = settings.depth
    G = 1 << depth
    h = 2.0 / G
    r = fine_stage(
        ev, m, var_vec, depth, rounds=_EDGE_ROUNDS,
        samples=_EDGE_SAMPLES, cancel=settings.cancel, clock=clock,
    )
    if r is None:
        return Mesh()
    cells, mask, res, ns, cs_cap = r
    nvert = VERT_COUNT[mask]
    crossing = CELL_TO_EDGE_TO_VERT[mask] >= 0

    if settings.collapse:
        # flat vertex ids 4*cell + slot match the device store layout
        voff4 = np.arange(len(cells) + 1, dtype=np.int64) * 4
        store = DeviceVertexStore(ev, m, var_vec, h, res, cs_cap, depth)
        v_bits_all = (np.arange(12) % 4)[None, :]
        own_all = crossing & (v_bits_all == 0)
        oci_all, oei_all = np.nonzero(own_all)
        check_cancel(settings.cancel)
        verts, tris = collapse_and_walk(
            ev=ev, m=m, var_vec=var_vec, G=G, h=h,
            cells=cells, mask=mask, nvert=nvert, voff=voff4,
            oci=oci_all, oei=oei_all, store=store,
            cancel=settings.cancel, clock=clock,
        )
        clock.tick("dual walk")
        return Mesh(vertices=verts, triangles=tris.astype(np.int32))

    # uniform walk: only the vertex positions come down
    voff = np.concatenate([[0], np.cumsum(nvert)]).astype(np.int64)
    ci2, lv2 = np.nonzero(np.arange(4)[None, :] < nvert[:, None])
    vpos_d = (
        np.asarray(res["vpos"])[: ns * 4]
        .reshape(ns, 4, 3)
        .astype(np.float64)[ci2, lv2]
    )
    clock.tick(f"vertex download ({len(vpos_d)} verts)")
    return _assemble_mesh(
        ev, m, var_vec, settings, clock, G, h, cells, mask, nvert, voff,
        None, None, None, None, None, vpos_d, crossing,
    )


def _assemble_mesh(
    ev, m, var_vec, settings, clock, G, h, cells, mask, nvert, voff,
    AtA, Atb, btb, msum, mcnt, vpos, crossing,
):
    """Shared tail of build_mesh: canonical crossing-edge enumeration,
    then the adaptive (collapse) or uniform dual walk."""
    # enumerate each crossing edge once, from its canonical owner cell
    # (the cell whose local edge has both fixed coords == 0) — shared by
    # the uniform and adaptive walks
    v_bits_all = (np.arange(12) % 4)[None, :]
    own_all = crossing & (v_bits_all == 0)
    oci_all, oei_all = np.nonzero(own_all)

    if settings.collapse:
        from .collapse import collapse_and_walk

        check_cancel(settings.cancel)
        verts, tris = collapse_and_walk(
            ev=ev, m=m, var_vec=var_vec, G=G, h=h,
            cells=cells, mask=mask, nvert=nvert, voff=voff,
            AtA=AtA, Atb=Atb, btb=btb, msum=msum, mcnt=mcnt, vpos=vpos,
            oci=oci_all, oei=oei_all, cancel=settings.cancel,
            clock=clock,
        )
        clock.tick("dual walk")
        return Mesh(vertices=verts, triangles=tris.astype(np.int32))

    # ---- stage 5: uniform dual triangulation ------------------------------
    # index lookup: leaf lattice key -> cell row
    cell_keys = (cells[:, 0] * G + cells[:, 1]) * G + cells[:, 2]
    order = np.argsort(cell_keys)
    sorted_keys = cell_keys[order]

    def cell_rows(coords):
        """[K, 3] lattice coords -> row ids (-1 if absent)."""
        keys = (coords[:, 0] * G + coords[:, 1]) * G + coords[:, 2]
        pos = np.searchsorted(sorted_keys, keys)
        pos = np.clip(pos, 0, len(sorted_keys) - 1)
        ok = (
            (sorted_keys[pos] == keys)
            & (coords >= 0).all(axis=1)
            & (coords < G).all(axis=1)
        )
        return np.where(ok, order[pos], -1)

    # canonical owner-edge set computed once above (own_all)
    oci, oei = oci_all, oei_all
    if len(oci) == 0:
        tris = np.zeros((0, 3), np.int64)
    else:
        axis = EDGE_AXIS[oei]
        # traverse the 4 adjacent cells in right-handed cyclic order
        # around +axis so the quad loop is CCW seen from the edge tip
        u1 = (axis + 1) % 3
        u2 = (axis + 2) % 3
        base = cells[oci]
        rng = np.arange(len(oci))
        quads = []
        for d1, d2 in ((0, 0), (1, 0), (1, 1), (0, 1)):
            nb = base.copy()
            nb[rng, u1] -= d1
            nb[rng, u2] -= d2
            rows = cell_rows(nb)
            # local edge v-bits use the sorted (lo_ax, hi_ax) convention
            vbits = np.where(u1 < u2, d1 + 2 * d2, d2 + 2 * d1)
            local_e = axis * 4 + vbits
            lv = np.where(
                rows >= 0, CELL_TO_EDGE_TO_VERT[mask[rows], local_e], -1
            )
            quads.append(np.where(rows >= 0, voff[rows] + lv, -1))
        q = np.stack(quads, axis=1)  # [K, 4] vertex ids around the edge
        good = (q >= 0).all(axis=1)
        q = q[good]
        # winding: orient by the sign of the edge's lo corner
        lo_inside = ((mask[oci] >> EDGE_LO[oei]) & 1).astype(bool)[good]
        q_fwd = q
        q_rev = q[:, ::-1]
        qq = np.where(lo_inside[:, None], q_fwd, q_rev)
        t1 = qq[:, [0, 1, 2]]
        t2 = qq[:, [0, 2, 3]]
        tris = np.concatenate([t1, t2], axis=0)
        # drop degenerate triangles (shared vertices after clustering)
        ok = (
            (tris[:, 0] != tris[:, 1])
            & (tris[:, 1] != tris[:, 2])
            & (tris[:, 0] != tris[:, 2])
        )
        tris = tris[ok]

    return Mesh(
        vertices=vpos.astype(np.float32),
        triangles=tris.astype(np.int32),
    )
