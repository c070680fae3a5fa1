"""Shape stdlib tests (semantics from fidget-shapes/src/lib.rs)."""

import numpy as np
import pytest

from fidget_tpu import Tree
from fidget_tpu.shapes import (
    SHAPE_REGISTRY,
    Axis,
    Blend,
    Box,
    Circle,
    Difference,
    ExtrudeZ,
    HalfPlane,
    Intersection,
    Inverse,
    LoftZ,
    Move,
    Plane,
    Rectangle,
    ReflectX,
    ReflectXY,
    RepeatX,
    Rotate,
    RotateZ,
    Scale,
    ScaleUniform,
    Sphere,
    Union,
    union,
)


def ev(shape, x, y, z=0.0):
    t = shape.to_tree() if hasattr(shape, "to_tree") else shape
    return t.eval(x, y, z)


def test_primitives():
    assert ev(Circle((0, 0), 1.0), 0, 0) == pytest.approx(-1.0)
    assert ev(Circle((1, 0), 1.0), 1, 0) == pytest.approx(-1.0)
    assert ev(Sphere((0, 0, 0), 1.0), 2, 0, 0) == pytest.approx(1.0)
    assert ev(Rectangle((-1, -2), (1, 2)), 0, 0) < 0
    assert ev(Rectangle((-1, -2), (1, 2)), 1.5, 0) > 0
    assert ev(Box((-1, -1, -1), (1, 1, 1)), 0, 0, 0.5) < 0
    assert ev(Box((-1, -1, -1), (1, 1, 1)), 0, 0, 1.5) > 0
    assert ev(HalfPlane(Plane(Axis.Z, 0.5)), 0, 0, 0) == pytest.approx(-0.5)


def test_csg():
    a = Circle((0, 0), 1.0)
    b = Circle((3, 0), 1.0)
    u = Union([a.to_tree(), b.to_tree()])
    assert ev(u, 3, 0) < 0 and ev(u, 0, 0) < 0 and ev(u, 1.5, 0) > 0
    i = Intersection([a.to_tree(), b.to_tree()])
    assert ev(i, 0, 0) > 0
    d = Difference(a.to_tree(), Circle((0, 0), 0.5).to_tree())
    assert ev(d, 0, 0) > 0 and ev(d, 0.75, 0) < 0
    assert ev(Inverse(a.to_tree()), 0, 0) == pytest.approx(1.0)
    # empty unions/intersections
    assert ev(Union([]), 0, 0) == np.inf
    assert ev(Intersection([]), 0, 0) == -np.inf
    # blend: interior matches min away from the seam
    bl = Blend(a.to_tree(), b.to_tree(), radius=0.1)
    assert ev(bl, 0, 0) == pytest.approx(ev(a, 0, 0))
    # blend pulls the surface outward between the shapes
    assert ev(bl, 1.5, 0) <= ev(u, 1.5, 0)


def test_transform_order_matches_reference():
    # mirror of fidget-shapes/src/lib.rs transform_order test
    x = Tree.x()
    moved = Move(x, (-1.0, 0.0, 0.0)).to_tree()
    assert moved.eval(0.0, 0.0, 0.0) == pytest.approx(1.0)
    assert moved.eval(0.0, 1.0, 0.0) == pytest.approx(1.0)
    assert moved.eval(-1.0, 0.0, 0.0) == pytest.approx(0.0)

    rotated = RotateZ(moved, angle=90.0, center=(0.0, 0.0, 0.0)).to_tree()
    assert rotated.eval(0.0, 0.0, 0.0) == pytest.approx(1.0)
    assert rotated.eval(0.0, -1.0, 0.0) == pytest.approx(0.0)
    assert rotated.eval(0.0, 1.0, 0.0) == pytest.approx(2.0)


def test_scale_and_reflect():
    s = Scale(Circle((0, 0), 1.0), (2.0, 1.0, 1.0)).to_tree()
    assert s.eval(2.0, 0.0, 0.0) == pytest.approx(0.0)
    su = ScaleUniform(Sphere(radius=1.0), 3.0).to_tree()
    assert su.eval(3.0, 0.0, 0.0) == pytest.approx(0.0)
    r = ReflectX(Move(Tree.x(), (-1, 0, 0)), 0.0).to_tree()
    # x+1 reflected about x=0 becomes -x+1
    assert r.eval(1.0, 0.0, 0.0) == pytest.approx(0.0)
    xy = ReflectXY(Tree.x(), 0.0).to_tree()
    assert xy.eval(0.0, 2.0, 0.0) == pytest.approx(2.0)


def test_rotate_arbitrary_axis():
    # rotating x around axis (1,1,1)/sqrt(3) by 120 deg maps x->y->z->x
    r = Rotate(Tree.x(), Axis((1, 1, 1)), 120.0).to_tree()
    assert r.eval(0.0, 5.0, 0.0) == pytest.approx(5.0, abs=1e-6)
    assert r.eval(5.0, 0.0, 0.0) == pytest.approx(0.0, abs=1e-6)


def test_extrude_loft_repeat():
    e = ExtrudeZ(Circle((0, 0), 1.0), 0.0, 2.0).to_tree()
    assert e.eval(0, 0, 1.0) < 0
    assert e.eval(0, 0, 3.0) > 0
    assert e.eval(0, 0, -1.0) > 0
    lo = LoftZ(Circle((0, 0), 1.0), Circle((0, 0), 0.5), 0.0, 1.0).to_tree()
    # at z=0.5 the blended radius is 0.75
    assert lo.eval(0.7, 0, 0.5) < 0 < lo.eval(0.8, 0, 0.5)
    rep = RepeatX(Circle((0, 0), 0.25), radius=1.0).to_tree()
    assert rep.eval(2.0, 0.0, 0.0) == pytest.approx(
        rep.eval(0.0, 0.0, 0.0), abs=1e-6
    )
    assert rep.eval(2.0, 0.0, 0.0) < 0


def test_registry_and_field_specs():
    assert "Sphere" in SHAPE_REGISTRY and "LoftZ" in SHAPE_REGISTRY
    assert len(SHAPE_REGISTRY) >= 25
    specs = {n: (t, d) for n, t, d in SHAPE_REGISTRY["Sphere"].field_specs()}
    assert "radius" in specs and "center" in specs


def test_functional_helpers():
    t = union(Circle((0, 0), 1.0), Circle((3, 0), 1.0))
    assert t.eval(3.0, 0.0, 0.0) < 0


def test_revolve_y_is_a_surface_of_revolution():
    """Deliberate divergence from the reference: its RevolveY uses
    r = sqrt(x^2 + y^2) (z-invariant — a prism, untested upstream); a
    revolution about Y must use r = sqrt(x^2 + z^2)."""
    from fidget_tpu.shape import Shape
    from fidget_tpu.shapes import Circle, RevolveY

    torus = RevolveY(Circle(center=(1.0, 0.0), radius=0.3)).to_tree()
    s = Shape.from_tree(torus)

    def d(x, y, z):
        return float(np.asarray(s.eval(x, y, z)))

    assert d(1.0, 0.0, 0.0) == pytest.approx(-0.3, abs=1e-5)  # tube center
    assert d(0.0, 0.0, 1.0) == pytest.approx(-0.3, abs=1e-5)  # rotated copy
    assert d(0.0, 0.0, -1.0) == pytest.approx(-0.3, abs=1e-5)
    assert d(1.0, 0.0, 5.0) > 1.0  # far along z must be OUTSIDE
    assert d(0.0, 0.0, 0.0) == pytest.approx(0.7, abs=1e-5)  # hole
