"""Shape API tests (mirrors fidget-core/src/shape/mod.rs doctests)."""

import numpy as np
import pytest

from fidget_tpu import Tree, Var
from fidget_tpu.shape import BoundShape, Shape, ShapeVars


def sphere_tree(r=1.0):
    x, y, z = Tree.axes()
    return (x.square() + y.square() + z.square()).sqrt() - r


def test_eval_points():
    s = Shape.from_tree(sphere_tree())
    x = np.array([0.0, 1.0, 2.0], np.float32)
    d = s.eval(x, 0.0, 0.0)
    np.testing.assert_allclose(d, [-1.0, 0.0, 1.0], atol=1e-6)


def test_apply_transform_scales():
    # scale model by 2: point (2,0,0) maps to model (1,0,0) -> on surface
    m = np.diag([0.5, 0.5, 0.5, 1.0])
    s = Shape.from_tree(sphere_tree()).apply_transform(m)
    d = s.eval(np.array([2.0], np.float32), 0.0, 0.0)
    np.testing.assert_allclose(d, [0.0], atol=1e-6)


def test_transform_composition_order():
    # translate then scale, matching Shape::apply_transform composition
    t = np.eye(4)
    t[0, 3] = 1.0  # x -> x + 1
    sc = np.diag([2.0, 1.0, 1.0, 1.0])  # x -> 2x
    s = Shape.from_tree(sphere_tree()).apply_transform(t).apply_transform(sc)
    # eval point x: model x = (2x) + 1
    d = s.eval(np.array([0.0], np.float32), 0.0, 0.0)
    np.testing.assert_allclose(d, [0.0], atol=1e-6)  # |1| - 1


def test_eval_interval_and_grad_transformed():
    m = np.diag([0.5, 0.5, 0.5, 1.0])
    s = Shape.from_tree(sphere_tree()).apply_transform(m)
    lo, hi = s.eval_interval(
        (np.float32(1.9), np.float32(2.1)),
        (np.float32(0.0), np.float32(0.0)),
        (np.float32(0.0), np.float32(0.0)),
    )
    assert lo <= 0.0 <= hi
    v, dx, dy, dz = s.eval_grad(np.array([2.0], np.float32), 0.0, 0.0)
    np.testing.assert_allclose(v, [0.0], atol=1e-6)
    # d/dx of (|0.5x| - 1) at x=2 is 0.5
    np.testing.assert_allclose(dx, [0.5], atol=1e-5)
    np.testing.assert_allclose(dy, [0.0], atol=1e-5)


def test_shape_vars_and_bound_shape():
    r = Var.new()
    x, y, z = Tree.axes()
    tree = (x.square() + y.square() + z.square()).sqrt() - Tree.var(r)
    s = Shape.from_tree(tree)
    assert s.vars == [r]
    with pytest.raises(ValueError):
        s.eval(1.0, 0.0, 0.0)  # unbound var
    d = s.eval(np.array([1.0], np.float32), 0.0, 0.0, {r: 0.25})
    np.testing.assert_allclose(d, [0.75], atol=1e-6)
    with pytest.raises(ValueError):
        BoundShape(s)  # missing binding
    b = s.bind({r: 0.5})
    np.testing.assert_allclose(
        b.eval(np.array([1.0], np.float32), 0.0, 0.0), [0.5], atol=1e-6
    )


def test_shape_vars_rejects_axes():
    sv = ShapeVars()
    with pytest.raises(ValueError):
        sv[Var.X] = 1.0
