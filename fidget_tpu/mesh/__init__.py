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

Topology-safe cell collapse (octree.rs:248-440) is intentionally not
performed: all surface cells sit at max depth, which MDC handles
manifoldly by construction.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

from ..compiler.tape import Tape
from ..eval.bulk import BulkEvaluator
from ..shape import Shape, ShapeVars
from .tables import (
    CELL_TO_EDGE_TO_VERT,
    CELL_TO_VERT_TO_EDGES,
    EDGE_AXIS,
    EDGE_HI,
    EDGE_LO,
    VERT_COUNT,
)

__all__ = ["Mesh", "Settings", "build_mesh", "write_stl"]

_EDGE_SAMPLES = 16  # octree.rs: 16 samples ...
_EDGE_ROUNDS = 4  # ... x 4 rounds


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


def write_stl(mesh: Mesh, f) -> None:
    """Binary STL writer (fidget-mesh/src/output.rs:7-40)."""
    own = isinstance(f, (str, bytes))
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


def build_mesh(tape: Tape | Shape, settings: Settings | None = None) -> Mesh:
    """Builds an MDC mesh of the surface inside the world ±1 cube."""
    settings = settings or Settings()
    tape, m, var_vec = _mat_and_vars(tape, settings)
    ev = BulkEvaluator(tape, interpret=settings.interpret)
    depth = settings.depth
    G = 1 << depth  # leaf grid resolution per axis
    h_leaf = 2.0 / G

    # ---- stage 1: level-synchronous interval build ----------------------
    cells = np.zeros((1, 3), np.int64)  # lattice coords at current depth
    for d in range(depth):
        h = 2.0 / (1 << d)
        lo = cells * h - 1.0
        wlo = lo
        whi = lo + h
        # transform the cell box through the affine matrix (exact box
        # bounds: split positive/negative coefficients)
        A = m[:3, :3]
        pos = np.maximum(A, 0.0)
        neg = np.minimum(A, 0.0)
        mlo = wlo @ pos.T + whi @ neg.T + m[:3, 3]
        mhi = whi @ pos.T + wlo @ neg.T + m[:3, 3]
        olo, ohi = ev.eval_interval(
            (mlo[:, 0], mhi[:, 0]), (mlo[:, 1], mhi[:, 1]),
            (mlo[:, 2], mhi[:, 2]), var_vec,
        )
        # classify on device: one bool transfer instead of two f32 planes
        active = np.asarray(~((olo[0] > 0.0) | (ohi[0] < 0.0)))
        cells = cells[active]
        if len(cells) == 0:
            return Mesh()
        # subdivide x8
        off = np.array(
            [[i, j, k] for k in (0, 1) for j in (0, 1) for i in (0, 1)],
            np.int64,
        )
        cells = (cells[:, None, :] * 2 + off[None, :, :]).reshape(-1, 3)

    # final leaf-level cull
    h = h_leaf
    wlo = cells * h - 1.0
    whi = wlo + h
    A = m[:3, :3]
    pos = np.maximum(A, 0.0)
    neg = np.minimum(A, 0.0)
    mlo = wlo @ pos.T + whi @ neg.T + m[:3, 3]
    mhi = whi @ pos.T + wlo @ neg.T + m[:3, 3]
    olo, ohi = ev.eval_interval(
        (mlo[:, 0], mhi[:, 0]), (mlo[:, 1], mhi[:, 1]),
        (mlo[:, 2], mhi[:, 2]), var_vec,
    )
    active = np.asarray(~((olo[0] > 0.0) | (ohi[0] < 0.0)))
    cells = cells[active]
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
    upts = np.stack(
        [uniq // ((G + 1) * (G + 1)), (uniq // (G + 1)) % (G + 1),
         uniq % (G + 1)], axis=1
    ).astype(np.float64)
    upts = upts * h - 1.0
    mpts = _xform(m, upts)
    usigns = np.asarray(
        ev.eval(mpts[:, 0], mpts[:, 1], mpts[:, 2], var_vec)[0] < 0.0
    )
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
    ta = np.zeros(E)
    tb = np.ones(E)
    for _ in range(_EDGE_ROUNDS):
        frac = (np.arange(_EDGE_SAMPLES) + 1.0) / (_EDGE_SAMPLES + 1.0)
        ts = ta[:, None] + (tb - ta)[:, None] * frac[None, :]  # [E, S]
        pts = (
            p_start[:, None, :]
            + (p_end - p_start)[:, None, :] * ts[..., None]
        ).reshape(-1, 3)
        mp = _xform(m, pts)
        # signs computed on device: one bool transfer per round
        inside = np.asarray(
            ev.eval(mp[:, 0], mp[:, 1], mp[:, 2], var_vec)[0] < 0.0
        ).reshape(E, _EDGE_SAMPLES)
        # bracket on the first inside->outside flip: samples before the
        # first outside sample are all inside, preserving the invariant
        # (start inside, end outside) like octree.rs:687-767
        outside = ~inside
        any_out = outside.any(axis=1)
        F = outside.argmax(axis=1)  # first outside sample (valid if any_out)
        tb = np.where(any_out, np.take_along_axis(ts, F[:, None], 1)[:, 0], tb)
        prev = np.maximum(F - 1, 0)
        ta = np.where(
            any_out & (F > 0),
            np.take_along_axis(ts, prev[:, None], 1)[:, 0],
            np.where(any_out, ta, ts[:, -1]),  # all inside: advance ta
        )
    t_star = 0.5 * (ta + tb)
    ipts = p_start + (p_end - p_start) * t_star[:, None]  # world coords [E,3]

    # ---- stage 4: gradients + per-vertex QEF ------------------------------
    mip = _xform(m, ipts)
    g = np.asarray(ev.eval_grad(mip[:, 0], mip[:, 1], mip[:, 2], var_vec))[0]
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
    AtA = np.zeros((NV, 3, 3))
    Atb = np.zeros((NV, 3))
    msum = np.zeros((NV, 3))
    mcnt = np.zeros(NV)
    np.add.at(msum, vid, pt)
    np.add.at(mcnt, vid, 1.0)
    nw = np.where(w[:, None], nm, 0.0)
    bw = (nw * pt).sum(axis=1)
    btb = np.zeros(NV)
    np.add.at(AtA, vid, nw[:, :, None] * nw[:, None, :])
    np.add.at(Atb, vid, nw * bw[:, None])
    np.add.at(btb, vid, bw * bw)
    mass = msum / np.maximum(mcnt, 1.0)[:, None]

    # batched truncated-SVD solve about the mass point (qef.rs:67-80)
    rhs = Atb - np.einsum("vij,vj->vi", AtA, mass)
    U, S, Vt = np.linalg.svd(AtA)
    smax = S[:, :1]
    keep = S > np.maximum(smax * 0.1, 1e-12)
    sinv = np.divide(1.0, S, out=np.zeros_like(S), where=keep)
    delta = np.einsum(
        "vji,vj->vi", Vt, sinv * np.einsum("vij,vi->vj", U, rhs)
    )
    vpos = mass + delta
    # clamp to the owning cell's bounds (one leaf cell per vertex)
    cell_of_vert = np.repeat(np.arange(N), nvert)
    clo = cells[cell_of_vert] * h - 1.0
    vpos = np.clip(vpos, clo, clo + h)
    vpos = np.where(np.isfinite(vpos), vpos, mass)

    # enumerate each crossing edge once, from its canonical owner cell
    # (the cell whose local edge has both fixed coords == 0) — shared by
    # the uniform and adaptive walks
    v_bits_all = (np.arange(12) % 4)[None, :]
    own_all = crossing & (v_bits_all == 0)
    oci_all, oei_all = np.nonzero(own_all)

    if settings.collapse:
        from .collapse import collapse_and_walk

        verts, tris = collapse_and_walk(
            ev=ev, m=m, var_vec=var_vec, G=G, h=h,
            cells=cells, mask=mask, nvert=nvert, voff=voff,
            AtA=AtA, Atb=Atb, btb=btb, msum=msum, mcnt=mcnt, vpos=vpos,
            oci=oci_all, oei=oei_all,
        )
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

    # enumerate each crossing edge once, from its canonical (min-corner)
    # owner cell: the cell whose local edge has both fixed coords == 0
    own = np.zeros_like(crossing)
    v_bits = (np.arange(12) % 4)[None, :]
    own = crossing & (v_bits == 0)
    oci, oei = np.nonzero(own)
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
