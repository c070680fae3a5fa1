"""Topology-safe octree collapse + adaptive dual walk.

The analog of the reference's bottom-up cell merging
(fidget-mesh/src/octree.rs:248-440): same-parent leaf cells merge into
one coarse cell when

1. every surface child is a single-vertex leaf (Nielson MDC clusters),
2. the merge is *topology-safe* in the sense of Ju et al. 2002: at the
   parent's 27 child-corner lattice points, every coarse-edge midpoint
   carries the sign of one of its edge endpoints, every face midpoint
   the sign of one of its face corners, and the center the sign of one
   of the 8 corners — so the fine iso-topology equals the coarse
   cell's (and each coarse edge has at most one crossing),
3. the parent's corner mask produces exactly one MDC vertex, and
4. the merged QEF error stays under 2x the children's total
   (octree.rs:334-336).

Merged QEFs are the sums of the child QEFs (octree.rs:315-354). The
dual walk over the resulting adaptive octree reuses the fine crossing
edges: each one's four adjacent leaves (of any size) contribute their
vertex; duplicate quads from coarse faces collapse by id (topology
safety guarantees one crossing per coarse edge), and quads degenerate
into the interior of a merged cell drop out as repeated ids.
"""

from __future__ import annotations

import numpy as np

from .tables import CELL_TO_EDGE_TO_VERT, EDGE_AXIS, EDGE_LO, VERT_COUNT

#: parent-relative offsets (in units of half the parent edge) of the
#: 27 sign-lattice points, (z, y, x) row-major
_LATTICE = np.array(
    [[x, y, z] for z in (0, 1, 2) for y in (0, 1, 2) for x in (0, 1, 2)],
    np.int64,
)


def _lat(x, y, z):
    return (z * 3 + y) * 3 + x


#: corner index (bit order x,y,z) -> lattice index
_CORNER_LAT = np.array(
    [_lat(2 * (c & 1), 2 * ((c >> 1) & 1), 2 * ((c >> 2) & 1)) for c in range(8)],
    np.int64,
)
#: 12 edges: (midpoint lattice, endpoint lattice a, endpoint lattice b)
_EDGE_CHECKS = []
for axis in range(3):
    for c in range(8):
        if (c >> axis) & 1:
            continue
        a = [2 * (c & 1), 2 * ((c >> 1) & 1), 2 * ((c >> 2) & 1)]
        b = list(a)
        b[axis] += 2
        mid = list(a)
        mid[axis] += 1
        _EDGE_CHECKS.append((_lat(*mid), _lat(*a), _lat(*b)))
_EDGE_CHECKS = np.array(sorted(set(_EDGE_CHECKS)), np.int64)
#: 6 faces: (midpoint lattice, 4 corner lattice points)
_FACE_CHECKS = []
for axis in range(3):
    for side in (0, 2):
        corners = []
        for u in (0, 2):
            for v in (0, 2):
                p = [0, 0, 0]
                p[axis] = side
                p[(axis + 1) % 3] = u
                p[(axis + 2) % 3] = v
                corners.append(_lat(*p))
        mid = [1, 1, 1]
        mid[axis] = side
        _FACE_CHECKS.append([_lat(*mid)] + corners)
_FACE_CHECKS = np.array(_FACE_CHECKS, np.int64)
_CENTER_LAT = _lat(1, 1, 1)


def _sym_eigvals3(A):
    """Closed-form eigenvalues of symmetric [N,3,3], descending
    (Smith's trigonometric method) — float64."""
    a00, a01, a02 = A[:, 0, 0], A[:, 0, 1], A[:, 0, 2]
    a11, a12, a22 = A[:, 1, 1], A[:, 1, 2], A[:, 2, 2]
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = (
        b00 * b00 + b11 * b11 + b22 * b22
        + 2.0 * (a01 * a01 + a02 * a02 + a12 * a12)
    ) / 6.0
    p = np.sqrt(np.maximum(p2, 0.0))
    det_b = (
        b00 * (b11 * b22 - a12 * a12)
        - a01 * (a01 * b22 - a12 * a02)
        + a02 * (a01 * a12 - b11 * a02)
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        r = det_b / (2.0 * p * p * p)
    r = np.clip(np.where(np.isfinite(r), r, 0.0), -1.0, 1.0)
    phi = np.arccos(r) / 3.0
    w0 = q + 2.0 * p * np.cos(phi)
    w2 = q + 2.0 * p * np.cos(phi + 2.0 * np.pi / 3.0)
    return np.stack([w0, 3.0 * q - w0 - w2, w2], axis=1)


def _cross_c(ax, ay, az, bx, by, bz):
    return ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx


def _eigvec3(A, lam):
    """Unit eigenvector of symmetric A for eigenvalue lam via the
    largest cross product of rows of (A - lam I); flags degenerate
    (repeated-eigenvalue) rows where every cross product vanishes.

    Componentwise over the batch: the straightforward np.stack/np.cross
    version spent ~9 us/element in temporaries (the single largest host
    cost of a depth-8 build); this form runs ~10x faster."""
    a01, a02, a12 = A[:, 0, 1], A[:, 0, 2], A[:, 1, 2]
    m00, m11, m22 = A[:, 0, 0] - lam, A[:, 1, 1] - lam, A[:, 2, 2] - lam
    # rows of M: r0 = (m00, a01, a02), r1 = (a01, m11, a12),
    #            r2 = (a02, a12, m22)
    c0 = _cross_c(m00, a01, a02, a01, m11, a12)
    c1 = _cross_c(m00, a01, a02, a02, a12, m22)
    c2 = _cross_c(a01, m11, a12, a02, a12, m22)
    n0 = c0[0] * c0[0] + c0[1] * c0[1] + c0[2] * c0[2]
    n1 = c1[0] * c1[0] + c1[1] * c1[1] + c1[2] * c1[2]
    n2 = c2[0] * c2[0] + c2[1] * c2[1] + c2[2] * c2[2]
    use1 = n1 >= n0
    nb = np.where(use1, n1, n0)
    use2 = n2 >= nb
    nbest = np.where(use2, n2, nb)
    vx = np.where(use2, c2[0], np.where(use1, c1[0], c0[0]))
    vy = np.where(use2, c2[1], np.where(use1, c1[1], c0[1]))
    vz = np.where(use2, c2[2], np.where(use1, c1[2], c0[2]))
    n = np.sqrt(nbest)
    absum = (
        np.abs(A[:, 0, 0]) + np.abs(A[:, 1, 1]) + np.abs(A[:, 2, 2])
        + 2.0 * (np.abs(a01) + np.abs(a02) + np.abs(a12))
    )
    scale = np.maximum(np.abs(lam), absum)
    good = n > 1e-14 * np.maximum(scale * scale, 1e-30)
    inv = np.where(good, 1.0 / np.where(n == 0, 1.0, n), 0.0)
    v = np.empty((len(lam), 3))
    v[:, 0] = vx * inv
    v[:, 1] = vy * inv
    v[:, 2] = vz * inv
    return v, good


def _sym_eig3(A):
    """Full closed-form eigendecomposition of symmetric [N,3,3].

    Returns (lam [N,3] descending, Q [N,3,3] with matching eigenvector
    COLUMNS). Strategy robust to every multiplicity pattern: take the
    most ISOLATED extreme eigenvalue (simple whenever the matrix is
    not a multiple of I, so the cross-product kernel extraction is
    well-conditioned), then diagonalize the projected 2x2 on its
    orthogonal complement in closed form."""
    n = len(A)
    W = _sym_eigvals3(A)
    iso_hi = (W[:, 0] - W[:, 1]) >= (W[:, 1] - W[:, 2])
    lam_iso = np.where(iso_hi, W[:, 0], W[:, 2])
    v_iso, good = _eigvec3(A, lam_iso)
    # A ~ qI: any basis
    vx = np.where(good, v_iso[:, 0], 1.0)
    vy = np.where(good, v_iso[:, 1], 0.0)
    vz = np.where(good, v_iso[:, 2], 0.0)
    # orthonormal complement {u, w}: alt = e_k at the smallest |v| comp
    ax_, ay_, az_ = np.abs(vx), np.abs(vy), np.abs(vz)
    min_x = (ax_ <= ay_) & (ax_ <= az_)
    min_y = ~min_x & (ay_ <= az_)
    altx = np.where(min_x, 1.0, 0.0)
    alty = np.where(min_y, 1.0, 0.0)
    altz = 1.0 - altx - alty
    ux, uy, uz = _cross_c(vx, vy, vz, altx, alty, altz)
    uinv = 1.0 / np.sqrt(ux * ux + uy * uy + uz * uz)
    ux, uy, uz = ux * uinv, uy * uinv, uz * uinv
    wx, wy, wz = _cross_c(vx, vy, vz, ux, uy, uz)
    # projected 2x2 symmetric [[p00, p01], [p01, p11]]
    a00, a01, a02 = A[:, 0, 0], A[:, 0, 1], A[:, 0, 2]
    a11, a12, a22 = A[:, 1, 1], A[:, 1, 2], A[:, 2, 2]

    def matv(x, y, z):
        return (
            a00 * x + a01 * y + a02 * z,
            a01 * x + a11 * y + a12 * z,
            a02 * x + a12 * y + a22 * z,
        )

    Aux, Auy, Auz = matv(ux, uy, uz)
    Awx, Awy, Awz = matv(wx, wy, wz)
    p00 = ux * Aux + uy * Auy + uz * Auz
    p01 = ux * Awx + uy * Awy + uz * Awz
    p11 = wx * Awx + wy * Awy + wz * Awz
    theta = 0.5 * np.arctan2(2.0 * p01, p00 - p11)
    c, s = np.cos(theta), np.sin(theta)
    vax, vay, vaz = c * ux + s * wx, c * uy + s * wy, c * uz + s * wz
    vbx, vby, vbz = c * wx - s * ux, c * wy - s * uy, c * wz - s * uz
    la = c * c * p00 + 2.0 * c * s * p01 + s * s * p11
    lb = (p00 + p11) - la
    # sort the three (lam, vec) pairs descending by lam with explicit
    # comparisons (matches the former stable argsort over
    # [lam_iso, la, lb]: ties keep that listing order)
    lam = np.empty((n, 3))
    Q = np.empty((n, 3, 3))
    l0, l1, l2 = lam_iso, la, lb
    v0 = (vx, vy, vz)
    v1 = (vax, vay, vaz)
    v2 = (vbx, vby, vbz)

    def pick(cond, t, f):
        return tuple(np.where(cond, a, b) for a, b in zip(t, f))

    # stable 3-element insertion sort on keys (descending)
    swap01 = l1 > l0
    k0, k1 = np.where(swap01, l1, l0), np.where(swap01, l0, l1)
    e0, e1 = pick(swap01, v1, v0), pick(swap01, v0, v1)
    swap12 = l2 > k1
    k1, k2 = np.where(swap12, l2, k1), np.where(swap12, k1, l2)
    e1, e2 = pick(swap12, v2, e1), pick(swap12, e1, v2)
    swap01b = k1 > k0
    k0, k1 = np.where(swap01b, k1, k0), np.where(swap01b, k0, k1)
    e0, e1 = pick(swap01b, e1, e0), pick(swap01b, e0, e1)
    lam[:, 0], lam[:, 1], lam[:, 2] = k0, k1, k2
    # eigenvector COLUMNS
    for j, e in enumerate((e0, e1, e2)):
        Q[:, 0, j], Q[:, 1, j], Q[:, 2, j] = e
    return lam, Q


def _solve_qef(AtA, Atb, mass):
    """Batched truncated QEF solve about the mass point.

    AtA is symmetric PSD 3x3, so the truncated pseudo-inverse comes
    from a closed-form eigendecomposition (`_sym_eig3`) vectorized over
    the batch — LAPACK's batched SVD was the single largest host cost
    of a depth-8 mesh build (0.66 s of 5.2 s). Truncation matches the
    reference: drop directions below 1e-3 of the largest eigenvalue
    (EIGENVALUE_CUTOFF_RELATIVE, fidget-mesh/src/qef.rs:96).

    Dispatches to the native C++ twin (native/mesh_kernels.cpp) when
    the toolchain is available: the host runs topology on ONE core,
    where numpy's ~150 full-array temporaries cost ~10x over the
    per-element register form (same formulas, same SVD-parity test)."""
    from .. import native

    nv = native.qef_solve_batch(AtA, Atb, mass)
    if nv is not None:
        return nv
    AtA = AtA.astype(np.float64, copy=False)
    # rhs = Atb - AtA @ mass, componentwise (einsum's per-call batch
    # overhead dominated the depth-8 profile)
    a00, a01, a02 = AtA[:, 0, 0], AtA[:, 0, 1], AtA[:, 0, 2]
    a11, a12, a22 = AtA[:, 1, 1], AtA[:, 1, 2], AtA[:, 2, 2]
    mx, my, mz = mass[:, 0], mass[:, 1], mass[:, 2]
    r0 = Atb[:, 0] - (a00 * mx + a01 * my + a02 * mz)
    r1 = Atb[:, 1] - (a01 * mx + a11 * my + a12 * mz)
    r2 = Atb[:, 2] - (a02 * mx + a12 * my + a22 * mz)
    W, Q = _sym_eig3(AtA)
    keep = W > np.maximum(W[:, :1] * 1e-3, 1e-12)
    winv = np.divide(1.0, W, out=np.zeros_like(W), where=keep)
    # delta = Q @ diag(winv) @ Q^T rhs, componentwise
    c0 = winv[:, 0] * (Q[:, 0, 0] * r0 + Q[:, 1, 0] * r1 + Q[:, 2, 0] * r2)
    c1 = winv[:, 1] * (Q[:, 0, 1] * r0 + Q[:, 1, 1] * r1 + Q[:, 2, 1] * r2)
    c2 = winv[:, 2] * (Q[:, 0, 2] * r0 + Q[:, 1, 2] * r1 + Q[:, 2, 2] * r2)
    v = np.empty_like(mass, dtype=np.float64)
    v[:, 0] = mx + Q[:, 0, 0] * c0 + Q[:, 0, 1] * c1 + Q[:, 0, 2] * c2
    v[:, 1] = my + Q[:, 1, 0] * c0 + Q[:, 1, 1] * c1 + Q[:, 1, 2] * c2
    v[:, 2] = mz + Q[:, 2, 0] * c0 + Q[:, 2, 1] * c1 + Q[:, 2, 2] * c2
    return np.where(np.isfinite(v), v, mass)


def _qef_err(v, AtA, Atb, btb):
    x, y, z = v[:, 0], v[:, 1], v[:, 2]
    vav = (
        AtA[:, 0, 0] * x * x + AtA[:, 1, 1] * y * y + AtA[:, 2, 2] * z * z
        + 2.0 * (
            AtA[:, 0, 1] * x * y + AtA[:, 0, 2] * x * z
            + AtA[:, 1, 2] * y * z
        )
    )
    return vav - 2.0 * (Atb[:, 0] * x + Atb[:, 1] * y + Atb[:, 2] * z) + btb


def topo_safe(inside):
    """Ju'02 topology-safety test on the 27-point sign lattice.

    inside: [K, 27] bool. True where the coarse cell's iso-topology
    equals the fine one's AND the merged mask has exactly one MDC
    vertex (see module docstring)."""
    corner = inside[:, _CORNER_LAT]  # [K, 8]
    pmask = (corner << np.arange(8)[None, :]).sum(axis=1)
    topo = VERT_COUNT[pmask] == 1
    for mid, a, b in _EDGE_CHECKS:
        topo &= (inside[:, mid] == inside[:, a]) | (
            inside[:, mid] == inside[:, b]
        )
    for row in _FACE_CHECKS:
        mid, quad = row[0], row[1:]
        topo &= (inside[:, mid][:, None] == inside[:, quad]).any(axis=1)
        # reject ambiguous (diagonal) coarse faces — they pinch the
        # single merged vertex between two surface sheets; corners
        # are ordered (u,v) = (0,0),(0,2),(2,0),(2,2)
        c0, c1, c2, c3 = (inside[:, q] for q in quad)
        ambiguous = (c0 == c3) & (c1 == c2) & (c0 != c1)
        topo &= ~ambiguous
    topo &= (inside[:, _CENTER_LAT][:, None] == corner).any(axis=1)
    return topo


class HostVertexStore:
    """Host-side vertex store for the collapse: per-vertex QEF sums,
    positions and residuals as numpy arrays (the eval="interp" path).

    The store interface (merge_round / commit / final_positions) is
    shared with mesh/fused.py's DeviceVertexStore, which keeps the same
    data device-resident and runs the merge mathematics on the TPU."""

    def __init__(self, ev, m, var_vec, G, h, AtA, Atb, btb, msum, mcnt,
                 vpos):
        self.ev, self.m, self.var_vec = ev, m, var_vec
        self.G, self.h = G, h
        self.vAtA = AtA.copy()
        self.vAtb = Atb.copy()
        self.vbtb = btb.copy()
        self.vms = msum.copy()
        self.vmc = mcnt.copy()
        self.vpos = vpos.copy()
        self.verr = _qef_err(vpos, AtA, Atb, btb)

    def merge_round(self, member_vids, seg_member, pbase, ps):
        """Merged QEF solve + topology test for K candidate parents.

        member_vids: [M] vertex ids, candidate-major; seg_member: [M]
        candidate index per member (nondecreasing); pbase: [K, 3] fine
        lattice coords of each parent's lo corner; ps: parent size.
        Returns (topo [K], mv [K,3], merr [K], cerr [K])."""
        from . import offset_signs

        K = len(pbase)
        starts = np.searchsorted(seg_member, np.arange(K))
        inside = offset_signs(
            self.ev, pbase, _LATTICE, ps // 2, self.h, self.m,
            self.var_vec,
        )
        topo = topo_safe(inside)

        def seg(a):
            return np.add.reduceat(a[member_vids], starts, axis=0)

        mAtA = seg(self.vAtA)
        mAtb = seg(self.vAtb)
        mbtb = seg(self.vbtb)
        mms = seg(self.vms)
        mmc = seg(self.vmc)
        cerr = seg(self.verr)
        mmass = mms / np.maximum(mmc, 1.0)[:, None]
        mv = _solve_qef(mAtA, mAtb, mmass)
        lo = pbase.astype(np.float64) * self.h - 1.0
        mv = np.clip(mv, lo, lo + ps * self.h)
        merr = _qef_err(mv, mAtA, mAtb, mbtb)
        self._pending = (mAtA, mAtb, mbtb, mms, mmc, mv, merr)
        return topo, mv, merr, cerr

    def commit(self, accept):
        """Appends the accepted candidates' merged vertices; returns
        their new vertex ids [n_accepted]."""
        mAtA, mAtb, mbtb, mms, mmc, mv, merr = self._pending
        acc = np.nonzero(accept)[0]
        new_vids = len(self.vpos) + np.arange(len(acc))
        self.vpos = np.concatenate([self.vpos, mv[acc]])
        self.vAtA = np.concatenate([self.vAtA, mAtA[acc]])
        self.vAtb = np.concatenate([self.vAtb, mAtb[acc]])
        self.vbtb = np.concatenate([self.vbtb, mbtb[acc]])
        self.vms = np.concatenate([self.vms, mms[acc]])
        self.vmc = np.concatenate([self.vmc, mmc[acc]])
        self.verr = np.concatenate([self.verr, merr[acc]])
        return new_vids

    def final_positions(self, ids):
        return self.vpos[ids].astype(np.float32)


def collapse_and_walk(
    *,
    ev,
    m,
    var_vec,
    G,
    h,
    cells,
    mask,
    nvert,
    voff,
    oci,
    oei,
    AtA=None,
    Atb=None,
    btb=None,
    msum=None,
    mcnt=None,
    vpos=None,
    store=None,
    cancel=None,
    clock=None,
):
    """Runs bottom-up collapse then the adaptive dual walk.

    Inputs are the fine-stage products of build_mesh (see mesh/__init__).
    oci/oei enumerate every fine crossing edge once from its canonical
    owner cell. Vertex data comes either as numpy arrays (AtA..vpos, the
    staged interp path — wrapped in a HostVertexStore) or as a
    ready-made `store` (mesh/fused.py's DeviceVertexStore with the data
    device-resident). Returns (vertices [V,3] f32, triangles [T,3] i64).
    """
    N = len(cells)
    # live cell state: coords in fine-lattice units, size (fine units),
    # vid >= 0 for single-vertex / merged cells, else -(fine row)-1 for
    # multi-vertex fine leaves (they keep per-edge vertex lookup)
    c_coord = cells.astype(np.int64).copy()
    c_size = np.ones(N, np.int64)
    c_fine = np.arange(N, dtype=np.int64)  # fine row (for CELL_TO_EDGE_TO_VERT)
    single = nvert == 1
    c_vid = np.where(single, voff[np.arange(N)], -1)

    if store is None:
        store = HostVertexStore(
            ev, m, var_vec, G, h, AtA, Atb, btb, msum, mcnt, vpos
        )

    from ..render.config import check_cancel

    s = 1
    while 2 * s <= G:
        check_cancel(cancel)
        ps = 2 * s
        # group current same-size cells by parent
        is_s = c_size == s
        idx_s = np.nonzero(is_s)[0]
        if len(idx_s) == 0:
            break
        pk = c_coord[idx_s] // ps  # [K, 3]
        pkey = (pk[:, 0] * (G // ps) + pk[:, 1]) * (G // ps) + pk[:, 2]
        order = np.argsort(pkey, kind="stable")
        pkey_s = pkey[order]
        idx_sorted = idx_s[order]
        # pkey_s is sorted: run-length boundaries instead of np.unique
        # (which would re-sort the 370k keys every round)
        newk = np.ones(len(pkey_s), bool)
        newk[1:] = pkey_s[1:] != pkey_s[:-1]
        starts = np.nonzero(newk)[0]
        uk = pkey_s[starts]
        counts = np.diff(np.append(starts, len(pkey_s)))
        # a parent qualifies structurally if all its member cells are
        # single-vertex; cells of other sizes cannot share the parent
        # region (power-of-two nesting)
        multi = (c_vid[idx_sorted] < 0).astype(np.int64)
        ok_members = np.add.reduceat(multi, starts) == 0
        cand = np.nonzero(ok_members)[0]
        # grading: a parent may not collapse while any finer-than-s cell
        # touches it (keeps adjacent leaf levels within 1, which makes
        # the per-round 9-point face checks exact on every shared
        # boundary — the classic restricted-octree condition)
        small_rows = np.nonzero(c_size < s)[0]
        if len(small_rows) and len(cand):
            sc = c_coord[small_rows]
            ss = c_size[small_rows]
            key_blocks = []
            for dx in (0, 1):
                for dy in (0, 1):
                    for dz in (0, 1):
                        p = sc + np.stack(
                            [dx * ss + dx - 1, dy * ss + dy - 1,
                             dz * ss + dz - 1], axis=1
                        )
                        np.clip(p, 0, G - 1, out=p)
                        pkk = p // ps
                        key_blocks.append(
                            (pkk[:, 0] * (G // ps) + pkk[:, 1])
                            * (G // ps) + pkk[:, 2]
                        )
            blocked = np.unique(np.concatenate(key_blocks))
            cand = cand[~np.isin(uk[cand], blocked)]
        if len(cand) == 0:
            s = ps
            continue
        pbase = np.zeros((len(cand), 3), np.int64)
        pbase[:, 0] = uk[cand] // ((G // ps) * (G // ps))
        pbase[:, 1] = (uk[cand] // (G // ps)) % (G // ps)
        pbase[:, 2] = uk[cand] % (G // ps)
        pbase *= ps

        # candidate-major member lists for the store's segment sums
        parent_of_member = np.repeat(
            np.arange(len(uk), dtype=np.int64), counts
        )
        cand_mask = np.zeros(len(uk), bool)
        cand_mask[cand] = True
        rank = np.cumsum(cand_mask) - 1  # parent group -> candidate idx
        mkeep = cand_mask[parent_of_member]
        member_rows = idx_sorted[mkeep]
        member_vids = c_vid[member_rows]  # all >= 0 (structural filter)
        seg_member = rank[parent_of_member][mkeep]

        # one store round: 27-point topology probe + merged QEF solve
        # (device-resident on the fused path — only topo/mv/merr/cerr
        # sized K cross the tunnel)
        topo, mv, merr, cerr = store.merge_round(
            member_vids, seg_member, pbase, int(ps)
        )
        accept = topo & (merr <= 2.0 * cerr + 1e-10)
        new_vids = store.commit(accept)

        # apply accepted merges: drop members, batch-append merged cells
        acc = np.nonzero(accept)[0]
        if len(acc):
            drop = np.zeros(len(c_size), bool)
            drop[member_rows[accept[seg_member]]] = True
            keep_rows = ~drop
            c_coord = np.concatenate([c_coord[keep_rows], pbase[acc]])
            c_size = np.concatenate(
                [c_size[keep_rows], np.full(len(acc), ps, np.int64)]
            )
            c_fine = np.concatenate(
                [c_fine[keep_rows], np.full(len(acc), -1, np.int64)]
            )
            c_vid = np.concatenate([c_vid[keep_rows], new_vids])
        if clock is not None:
            clock.tick(
                f"collapse s={s} ({len(cand)} cand, {len(acc)} merged)"
            )
        s = ps

    # ---- adaptive dual walk over the fine crossing edges ----------------
    if G <= 256:
        # dense fine-lattice ownership grid: paint every live cell's
        # sz^3 region once (~Sigma sz^3 scatter writes, bounded by a
        # few G^3/10), then every neighbor query is one gather — ~5x
        # faster than the per-size searchsorted tables at depth 8
        # (the walk was ~0.7 s of the 3.7 s warm build, VERDICT r4
        # weak #4). G=256 costs 64 MB of int32; deeper builds fall
        # back to the log-time tables below.
        grid = np.full(G * G * G, -1, np.int32)
        for sz in np.unique(c_size):
            rows = np.nonzero(c_size == sz)[0].astype(np.int32)
            cc = c_coord[rows]
            base_flat = (cc[:, 0] * G + cc[:, 1]) * G + cc[:, 2]
            if sz == 1:
                grid[base_flat] = rows
                continue
            dz, dy, dx = np.meshgrid(
                np.arange(sz), np.arange(sz), np.arange(sz),
                indexing="ij",
            )
            off = (dx.ravel() * G + dy.ravel()) * G + dz.ravel()
            grid[(base_flat[:, None] + off[None, :]).ravel()] = (
                np.repeat(rows, len(off))
            )

        def locate(coords):
            """Fine-cell coords [K, 3] -> live cell rows (-1 outside)."""
            in_grid = ((coords >= 0) & (coords < G)).all(axis=1)
            c = np.where(in_grid[:, None], coords, 0)
            flat = (c[:, 0] * G + c[:, 1]) * G + c[:, 2]
            out = grid[flat].astype(np.int64)
            out[~in_grid] = -1
            return out
    else:
        # per-size lookup: coord key -> live cell row
        size_tables = {}
        for sz in np.unique(c_size):
            rows = np.nonzero(c_size == sz)[0]
            cc = c_coord[rows] // sz
            keys = (cc[:, 0] * G + cc[:, 1]) * G + cc[:, 2]
            o = np.argsort(keys)
            size_tables[int(sz)] = (keys[o], rows[o])

        def locate(coords):
            """Fine-cell coords [K, 3] -> live cell rows (-1 outside)."""
            out = np.full(len(coords), -1, np.int64)
            in_grid = ((coords >= 0) & (coords < G)).all(axis=1)
            pending = in_grid.copy()
            for sz in sorted(size_tables, reverse=True):
                if not pending.any():
                    break
                keys_s, rows_s = size_tables[sz]
                cc = coords // sz
                k = (cc[:, 0] * G + cc[:, 1]) * G + cc[:, 2]
                pos = np.searchsorted(keys_s, k)
                pos = np.clip(pos, 0, len(keys_s) - 1)
                hit = pending & (keys_s[pos] == k)
                out[hit] = rows_s[pos[hit]]
                pending &= ~hit
            return out

    axis = EDGE_AXIS[oei]
    u1 = (axis + 1) % 3
    u2 = (axis + 2) % 3
    base = cells[oci].astype(np.int64)
    K = len(oci)
    rng = np.arange(K)
    # all 4 neighbor queries in ONE locate call (the per-size
    # searchsorted loop runs once instead of four times)
    nb4 = np.broadcast_to(base, (4, K, 3)).copy()
    for qi, (d1, d2) in enumerate(((0, 0), (1, 0), (1, 1), (0, 1))):
        nb4[qi, rng, u1] -= d1
        nb4[qi, rng, u2] -= d2
    rows4 = locate(nb4.reshape(-1, 3)).reshape(4, K)
    quad = np.full((K, 4), -1, np.int64)
    for qi, (d1, d2) in enumerate(((0, 0), (1, 0), (1, 1), (0, 1))):
        rows = rows4[qi]
        found = rows >= 0
        fine = np.where(found, c_fine[np.maximum(rows, 0)], -1)
        vbits = np.where(u1 < u2, d1 + 2 * d2, d2 + 2 * d1)
        local_e = axis * 4 + vbits
        fine_ok = found & (fine >= 0)
        lv = np.where(
            fine_ok,
            CELL_TO_EDGE_TO_VERT[mask[np.maximum(fine, 0)], local_e],
            -1,
        )
        v_fine = np.where(fine_ok & (lv >= 0), voff[np.maximum(fine, 0)] + lv, -1)
        v_merged = np.where(
            found & (fine < 0), c_vid[np.maximum(rows, 0)], -1
        )
        quad[:, qi] = np.where(fine_ok, v_fine, v_merged)

    good = (quad >= 0).all(axis=1)
    quad = quad[good]
    lo_inside = ((mask[oci] >> EDGE_LO[oei]) & 1).astype(bool)[good]
    qq = np.where(lo_inside[:, None], quad, quad[:, ::-1])
    # dedupe repeated quads from coarse faces by unordered id set;
    # two packed int64 lexsort keys instead of np.unique(axis=0)'s
    # void-dtype sort (vertex ids stay < 2^31)
    key = np.sort(qq, axis=1)
    k1 = (key[:, 0] << 32) | key[:, 1]
    k2 = (key[:, 2] << 32) | key[:, 3]
    order_q = np.lexsort((k2, k1))
    k1s, k2s = k1[order_q], k2[order_q]
    new = np.ones(len(k1s), bool)
    new[1:] = (k1s[1:] != k1s[:-1]) | (k2s[1:] != k2s[:-1])
    first = order_q[new]
    qq = qq[np.sort(first)]
    tris = np.concatenate([qq[:, [0, 1, 2]], qq[:, [0, 2, 3]]], axis=0)
    ok = (
        (tris[:, 0] != tris[:, 1])
        & (tris[:, 1] != tris[:, 2])
        & (tris[:, 0] != tris[:, 2])
    )
    tris = tris[ok]

    # compact the vertex array to referenced vertices; only these rows
    # ever leave the store (on the fused path that is the single
    # vertex-position download of the whole build)
    used = np.unique(tris)
    remap = np.full(int(used[-1]) + 1 if len(used) else 0, -1, np.int64)
    remap[used] = np.arange(len(used))
    return store.final_positions(used), remap[tris]
