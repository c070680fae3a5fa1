"""MDC meshing tests (strategy from fidget/tests/octree.rs and
fidget-mesh unit tests)."""

import io

import numpy as np
import pytest

from fidget_tpu import Context, Tree, Var, lower
from fidget_tpu.mesh import Mesh, Settings, build_mesh, write_stl
from fidget_tpu.mesh.tables import (
    CELL_TO_EDGE_TO_VERT,
    CELL_TO_VERT_TO_EDGES,
    VERT_COUNT,
)
from fidget_tpu.shape import Shape


def sphere_tape(r=0.6):
    ctx = Context()
    x, y, z = ctx.x(), ctx.y(), ctx.z()
    r2 = ctx.add(ctx.square(x), ctx.add(ctx.square(y), ctx.square(z)))
    return lower(ctx, [ctx.sub(ctx.sqrt(r2), r)])


def _manifold_stats(mesh):
    t = mesh.triangles
    v = mesh.vertices
    e = np.concatenate([t[:, [0, 1]], t[:, [1, 2]], t[:, [2, 0]]])
    e.sort(axis=1)
    _, counts = np.unique(
        e[:, 0].astype(np.int64) * len(v) + e[:, 1], return_counts=True
    )
    return counts


def test_tables():
    assert len(CELL_TO_VERT_TO_EDGES) == 256
    assert VERT_COUNT[0] == 0 and VERT_COUNT[255] == 0
    # single inside corner: one vertex with 3 crossing edges
    assert VERT_COUNT[1] == 1
    assert len(CELL_TO_VERT_TO_EDGES[1][0]) == 3
    # the classic 4-diagonal mask produces 4 vertices
    assert VERT_COUNT[0b01101001] == 4
    # every crossing edge belongs to exactly one vertex
    for m in range(256):
        owned = [e for vs in CELL_TO_VERT_TO_EDGES[m] for (_, _, e) in vs]
        assert sorted(owned) == sorted(
            np.nonzero(CELL_TO_EDGE_TO_VERT[m] >= 0)[0].tolist()
        )
        assert len(set(owned)) == len(owned)


def test_sphere_mesh():
    mesh = build_mesh(sphere_tape(0.6), Settings(depth=5, interpret=True))
    assert len(mesh.triangles) > 1000
    r = np.linalg.norm(mesh.vertices, axis=1)
    assert r.min() > 0.58 and r.max() < 0.62
    # closed 2-manifold: every edge used exactly twice
    assert (_manifold_stats(mesh) == 2).all()
    # consistent outward winding
    v, t = mesh.vertices, mesh.triangles
    n = np.cross(v[t[:, 1]] - v[t[:, 0]], v[t[:, 2]] - v[t[:, 0]])
    c = (v[t[:, 0]] + v[t[:, 1]] + v[t[:, 2]]) / 3
    assert ((n * c).sum(1) > 0).all()
    # area close to the analytic sphere
    area = 0.5 * np.linalg.norm(n, axis=1).sum()
    assert area == pytest.approx(4 * np.pi * 0.36, rel=0.01)


def test_unrolled_eval_mesh():
    # Settings(eval="unrolled") routes classify / corner signs / edge
    # search / collapse sign probes through whole-tape XLA cores: the
    # mesh must stay a closed outward 2-manifold at the right radius,
    # with vertices near the interpreter build's (float-assoc-level
    # differences only)
    mesh = build_mesh(
        sphere_tape(0.6), Settings(depth=5, interpret=True, eval="unrolled")
    )
    assert (_manifold_stats(mesh) == 2).all()
    r = np.linalg.norm(mesh.vertices, axis=1)
    assert r.min() > 0.58 and r.max() < 0.62
    ref = build_mesh(sphere_tape(0.6), Settings(depth=5, interpret=True))
    assert len(mesh.vertices) == len(ref.vertices)
    d = np.abs(np.sort(r) - np.sort(np.linalg.norm(ref.vertices, axis=1)))
    assert d.max() < 1e-3


def test_sphere_mesh_with_camera_transform():
    # mirror of fidget/tests/octree.rs:8-30: a scaled+offset camera
    mat = np.eye(4)
    mat[:3, :3] *= 2.0  # world [-1,1] views model [-2,2]
    mat[0, 3] = 0.5
    shape = Shape.from_tree(
        (Tree.x().square() + Tree.y().square() + Tree.z().square()).sqrt()
        - 1.5
    )
    mesh = build_mesh(
        shape, Settings(depth=5, world_to_model=mat, interpret=True)
    )
    assert len(mesh.triangles) > 0
    # model-space sphere radius 1.5 center 0 -> world center (-0.25, 0, 0),
    # radius 0.75
    c = np.array([-0.25, 0.0, 0.0])
    r = np.linalg.norm(mesh.vertices - c, axis=1)
    assert r.min() > 0.72 and r.max() < 0.78


def test_mesh_with_var():
    rv = Var.new()
    t = (
        Tree.x().square() + Tree.y().square() + Tree.z().square()
    ).sqrt() - Tree.var(rv)
    shape = Shape.from_tree(t)
    mesh = build_mesh(
        shape, Settings(depth=4, vars={rv: 0.5}, interpret=True)
    )
    r = np.linalg.norm(mesh.vertices, axis=1)
    assert r.min() > 0.45 and r.max() < 0.55
    with pytest.raises(ValueError):
        build_mesh(shape, Settings(depth=3, interpret=True))


def test_gyroid_mesh_manifold():
    x, y, z = Tree.axes()
    s = 4.0
    g = (
        (x * s).sin() * (y * s).cos()
        + (y * s).sin() * (z * s).cos()
        + (z * s).sin() * (x * s).cos()
    )
    shape = Shape.from_tree(
        (abs(g) - 0.2).max(
            (x.square() + y.square() + z.square()).sqrt() - 0.8
        )
    )
    mesh = build_mesh(shape, Settings(depth=5, interpret=True))
    assert len(mesh.triangles) > 2000
    counts = _manifold_stats(mesh)
    # closed surface away from clipping: nearly all edges shared twice
    assert (counts == 2).mean() > 0.99


def test_empty_mesh():
    ctx = Context()
    tape = lower(ctx, [ctx.add(ctx.square(ctx.x()), 1.0)])  # never < 0
    mesh = build_mesh(tape, Settings(depth=4, interpret=True))
    assert len(mesh.vertices) == 0 and len(mesh.triangles) == 0


def test_stl_roundtrip():
    mesh = build_mesh(sphere_tape(0.5), Settings(depth=4, interpret=True))
    buf = io.BytesIO()
    write_stl(mesh, buf)
    data = buf.getvalue()
    assert len(data) == 84 + 50 * len(mesh.triangles)
    (n,) = np.frombuffer(data[80:84], "<u4")
    assert n == len(mesh.triangles)
    # first triangle vertices match
    rec = np.frombuffer(data[84 : 84 + 48], "<f4")
    np.testing.assert_allclose(
        rec[3:6], mesh.vertices[mesh.triangles[0, 0]], rtol=1e-6
    )
    # OBJ keeps the indexed (shared-vertex) structure
    import io as _io

    sbuf = _io.StringIO()
    mesh.write_obj(sbuf)
    lines = sbuf.getvalue().splitlines()
    vs = [l for l in lines if l.startswith("v ")]
    fs = [l for l in lines if l.startswith("f ")]
    assert len(vs) == len(mesh.vertices) and len(fs) == len(mesh.triangles)
    got = np.array([float(t) for t in vs[0].split()[1:]])
    np.testing.assert_allclose(got, mesh.vertices[0], rtol=1e-6)
    idx = np.array([int(t) for t in fs[0].split()[1:]]) - 1
    np.testing.assert_array_equal(idx, mesh.triangles[0])


def _manifold_frac(mesh):
    c = _manifold_stats(mesh)
    return float((c == 2).mean())


def test_collapse_box_to_minimal():
    from fidget_tpu.shapes import Box

    tape = Shape.from_tree(
        Box((-0.61, -0.61, -0.61), (0.59, 0.62, 0.63)).to_tree()
    ).tape()
    full = build_mesh(tape, Settings(depth=5, collapse=False, interpret=True))
    merged = build_mesh(tape, Settings(depth=5, collapse=True, interpret=True))
    # a flat box collapses to the minimal closed cube
    assert len(merged.triangles) == 12 and len(merged.vertices) == 8
    assert _manifold_frac(merged) == 1.0
    # area preserved
    def area(m):
        v, t = m.vertices, m.triangles
        n = np.cross(v[t[:, 1]] - v[t[:, 0]], v[t[:, 2]] - v[t[:, 0]])
        return 0.5 * np.linalg.norm(n, axis=1).sum()

    assert area(merged) == pytest.approx(area(full), rel=1e-3)


def test_collapse_keeps_gyroid_manifold():
    x, y, z = Tree.axes()
    s = 4.0
    g = (
        (x * s).sin() * (y * s).cos()
        + (y * s).sin() * (z * s).cos()
        + (z * s).sin() * (x * s).cos()
    )
    shape = Shape.from_tree(
        (abs(g) - 0.2).max((x.square() + y.square() + z.square()).sqrt() - 0.8)
    )
    mesh = build_mesh(shape, Settings(depth=5, collapse=True, interpret=True))
    assert len(mesh.triangles) > 1000
    counts = _manifold_stats(mesh)
    assert (counts == 2).mean() > 0.99


def test_collapse_mixed_flat_and_curved():
    from fidget_tpu.shapes import Box, Difference, Sphere

    tape = Shape.from_tree(
        Difference(
            Box((-0.7, -0.7, -0.7), (0.7, 0.7, 0.7)), Sphere(radius=0.8)
        ).to_tree()
    ).tape()
    full = build_mesh(tape, Settings(depth=5, collapse=False, interpret=True))
    merged = build_mesh(tape, Settings(depth=5, collapse=True, interpret=True))
    assert len(merged.triangles) < 0.8 * len(full.triangles)
    assert _manifold_frac(merged) == 1.0


def test_ambiguous_face_pinch_topology():
    """Fuzz seed 1424 regression: an ambiguous face (alternating corner
    signs, 4 crossing lattice edges) between two single-component cells
    pinches the surface — its vertex pair is used by up to 4 triangles
    (3 here: one ring quad is dropped at the open volume boundary).
    The reference's dual walk emits the identical topology (same
    Nielson clustering, fidget-mesh/build.rs; quad-per-crossing-edge,
    dc.rs:11-226). Invariant: count <= 4, direction imbalance <= 1."""
    import sys as _sys
    from pathlib import Path

    _sys.path.insert(0, str(Path(__file__).parent))
    from test_fuzz import random_tape

    tape = random_tape(1424, dims=3)
    mesh = build_mesh(tape, Settings(depth=4, interpret=True))
    t = mesh.triangles
    e = np.concatenate([t[:, [0, 1]], t[:, [1, 2]], t[:, [2, 0]]])
    und = np.sort(e, axis=1)
    uniq, inv, counts = np.unique(
        und, axis=0, return_inverse=True, return_counts=True
    )
    # this seed exercises the pinch: at least one edge above 2
    assert counts.max() == 3
    assert (counts <= 4).all()
    fwd = np.bincount(
        inv, weights=(e[:, 0] < e[:, 1]), minlength=len(uniq)
    )
    assert (np.abs(2 * fwd - counts) <= 1).all()


def test_mesh_settings_validation_and_pathlike_writers(tmp_path):
    tape = sphere_tape()
    with pytest.raises(ValueError, match="depth"):
        build_mesh(tape, Settings(depth=11, interpret=True))
    with pytest.raises(ValueError, match="eval"):
        build_mesh(tape, Settings(depth=3, interpret=True, eval="unroled"))
    m = build_mesh(tape, Settings(depth=3, interpret=True))
    p = tmp_path / "out.stl"
    m.write_stl(p)  # pathlib.Path, not str
    assert p.stat().st_size > 84
    po = tmp_path / "out.obj"
    m.write_obj(po)
    assert po.read_text().startswith("v ")


def test_qef_closed_form_matches_svd():
    """_solve_qef's closed-form symmetric eigendecomposition must match
    the LAPACK truncated-SVD solve on every multiplicity pattern —
    including the repeated-DOMINANT eigenvalue case (box edges:
    AtA = diag(0, c, c)) that a naive cross-product eigenvector
    extraction gets wrong."""
    from fidget_tpu.mesh.collapse import _solve_qef

    def svd_ref(AtA, Atb, mass):
        rhs = Atb - np.einsum("vij,vj->vi", AtA, mass)
        U, S, Vt = np.linalg.svd(AtA)
        keep = S > np.maximum(S[:, :1] * 1e-3, 1e-12)
        sinv = np.divide(1.0, S, out=np.zeros_like(S), where=keep)
        delta = np.einsum(
            "vji,vj->vi", Vt, sinv * np.einsum("vij,vi->vj", U, rhs)
        )
        v = mass + delta
        return np.where(np.isfinite(v), v, mass)

    rng = np.random.default_rng(0)
    N = 500
    cases = []
    for rank in (3, 2, 1):
        M = rng.normal(size=(N, rank, 3))
        cases.append(np.einsum("vkj,vki->vji", M, M))
    cases.append(
        np.repeat(np.eye(3)[None], N, 0)
        * rng.uniform(0.5, 2, (N, 1, 1))
    )
    cases.append(np.zeros((N, 3, 3)))
    for pat in ([0, 1, 1], [1, 1, 0], [1, 0, 1], [0, 0, 1]):
        c = rng.uniform(1, 20, (N, 1))
        d = np.zeros((N, 3, 3))
        d[:, [0, 1, 2], [0, 1, 2]] = np.asarray(pat)[None] * c
        cases.append(d)
    qr = np.linalg.qr(rng.normal(size=(N, 3, 3)))[0]
    dd = np.zeros((N, 3, 3))
    dd[:, 0, 0] = dd[:, 1, 1] = rng.uniform(1, 20, N)
    cases.append(np.einsum("vij,vjk,vlk->vil", qr, dd, qr))
    AtA = np.concatenate(cases)
    n = len(AtA)
    Atb = rng.normal(size=(n, 3))
    mass = rng.normal(size=(n, 3)) * 0.1
    np.testing.assert_allclose(
        _solve_qef(AtA, Atb, mass), svd_ref(AtA, Atb, mass),
        rtol=1e-7, atol=1e-9,
    )
