"""Expression-layer tests: dedup, folding, identities, .vm, deriv."""

import math

import numpy as np
import pytest

from fidget_tpu import Context, Tree, Var
from fidget_tpu.io.models import has_model, load_vm


def test_dedup_and_folding():
    ctx = Context()
    x = ctx.x()
    a = ctx.add(x, 1.0)
    b = ctx.add(x, 1.0)
    assert a == b
    # commutative sorting dedups flipped args
    y = ctx.y()
    assert ctx.add(x, y) == ctx.add(y, x)
    assert ctx.mul(x, y) == ctx.mul(y, x)
    # constant folding
    c = ctx.add(ctx.constant(1.0), ctx.constant(2.0))
    assert ctx.get_const(c) == 3.0


def test_identity_simplifications():
    ctx = Context()
    x = ctx.x()
    zero = ctx.constant(0.0)
    one = ctx.constant(1.0)
    assert ctx.add(x, zero) == x
    assert ctx.add(zero, x) == x
    assert ctx.sub(x, zero) == x
    assert ctx.mul(x, one) == x
    assert ctx.div(x, one) == x
    assert ctx.min(x, x) == x
    assert ctx.max(x, x) == x
    # x + x -> 2 * x -> stored as mul
    assert ctx.add(x, x) == ctx.mul(x, ctx.constant(2.0))
    # x * x -> square
    assert ctx.mul(x, x) == ctx.square(x)
    # 0 - x -> neg
    assert ctx.sub(zero, x) == ctx.neg(x)


def test_eval_circle():
    ctx = Context()
    x, y = ctx.x(), ctx.y()
    r = ctx.sqrt(ctx.add(ctx.square(x), ctx.square(y)))
    circle = ctx.sub(r, 1.0)
    assert ctx.eval_xyz(circle, 0.0, 0.0, 0.0) == -1.0
    assert ctx.eval_xyz(circle, 1.0, 0.0, 0.0) == 0.0
    assert abs(ctx.eval_xyz(circle, 3.0, 4.0, 0.0) - 4.0) < 1e-12


def test_from_text_doc_example():
    txt = """
# This is a comment!
0x600000b90000 var-x
0x600000b900a0 square 0x600000b90000
0x600000b90050 var-y
0x600000b900f0 square 0x600000b90050
0x600000b90140 add 0x600000b900a0 0x600000b900f0
0x600000b90190 sqrt 0x600000b90140
0x600000b901e0 const 1
"""
    ctx, _node = Context.from_text(txt)
    assert len(ctx) == 7


def test_export_roundtrip():
    ctx = Context()
    x, y = ctx.x(), ctx.y()
    f = ctx.max(ctx.min(x, y), ctx.sub(ctx.square(x), 0.5))
    txt = ctx.export(f)
    ctx2, root2 = Context.from_text(txt)
    for px, py in [(0.3, -0.2), (1.5, 2.0), (-1.0, 0.5)]:
        assert ctx.eval_xyz(f, px, py, 0.0) == ctx2.eval_xyz(root2, px, py, 0.0)


@pytest.mark.skipif(not has_model("hi.vm"), reason="model assets unavailable")
def test_load_bundled_models():
    for name, approx_len in [("hi.vm", 57), ("quarter.vm", 13)]:
        ctx, root = load_vm(name)
        # dedup may shrink below source line count, never grow
        assert len(ctx) <= approx_len + 5
        v = ctx.eval_xyz(root, 0.0, 0.0, 0.0)
        assert math.isfinite(v)


def test_deriv_smooth_ops():
    ctx = Context()
    x = ctx.x()
    y = ctx.y()
    f = ctx.add(ctx.mul(ctx.sin(x), y), ctx.square(x))
    dfdx = ctx.deriv(f, Var.X)
    dfdy = ctx.deriv(f, Var.Y)
    for px, py in [(0.5, 2.0), (-1.2, 0.3)]:
        expect_dx = math.cos(px) * py + 2 * px
        expect_dy = math.sin(px)
        assert abs(ctx.eval_xyz(dfdx, px, py, 0.0) - expect_dx) < 1e-9
        assert abs(ctx.eval_xyz(dfdy, px, py, 0.0) - expect_dy) < 1e-9


def test_deriv_discontinuous_ops():
    ctx = Context()
    x, y = ctx.x(), ctx.y()
    # abs: subgradient picks sign
    dabs = ctx.deriv(ctx.abs(x), Var.X)
    assert ctx.eval_xyz(dabs, 2.0, 0.0, 0.0) == 1.0
    assert ctx.eval_xyz(dabs, -2.0, 0.0, 0.0) == -1.0
    # min/max pick a side
    dmin = ctx.deriv(ctx.min(x, y), Var.X)
    assert ctx.eval_xyz(dmin, 1.0, 2.0, 0.0) == 1.0
    assert ctx.eval_xyz(dmin, 2.0, 1.0, 0.0) == 0.0
    # floor has zero derivative
    dfl = ctx.deriv(ctx.floor(x), Var.X)
    assert ctx.eval_xyz(dfl, 1.5, 0.0, 0.0) == 0.0
    # mod derivative matches finite differences away from seams
    dm = ctx.deriv(ctx.modulo(x, ctx.constant(1.5)), Var.X)
    assert ctx.eval_xyz(dm, 0.7, 0.0, 0.0) == 1.0


def test_tree_remap_and_affine():
    t = (Tree.x().square() + Tree.y().square()).sqrt() - 1.0
    assert t.eval(1.0, 0.0) == 0.0
    swapped = t.remap_xyz(Tree.y(), Tree.x(), Tree.z())
    assert swapped.eval(0.0, 1.0) == 0.0
    m = np.eye(4)
    m[0, 3] = 2.0
    assert t.remap_affine(m).eval(-1.0, 0.0) == 0.0
    # chained affines compose
    s = np.diag([2.0, 2.0, 2.0, 1.0])
    chained = t.remap_affine(m).remap_affine(s)
    # x -> 2x then +2: point (-0.5, 0) maps to (1, 0)
    assert chained.eval(-0.5, 0.0) == 0.0


def test_tree_var_and_operators():
    v = Var.new()
    t = Tree.var(v) * 2.0 + Tree.x()
    ctx = Context()
    node = ctx.import_tree(t)
    assert ctx.eval(node, {Var.X: 1.0, v: 3.0}) == 7.0


def test_dot_export():
    ctx = Context()
    f = ctx.min(ctx.x(), ctx.y())
    dot = ctx.dot([f])
    assert "digraph" in dot and "goldenrod" in dot


def test_deep_tree_import_is_iterative():
    # a 100k-deep chain would overflow Python recursion if import_tree
    # recursed; the iterative walk must handle it in O(depth)
    t = Tree.x()
    for i in range(100_000):
        t = t + float(i % 7)
    ctx = Context()
    root = ctx.import_tree(t)
    assert isinstance(root, int)


def test_deep_remap_chain_import():
    t = (Tree.x() + Tree.y()).min(Tree.z())
    for _ in range(2_000):
        t = t.remap_xyz(Tree.y(), Tree.z(), Tree.x())
    ctx = Context()
    root = ctx.import_tree(t)
    # 3 remaps = identity; 2000 % 3 == 2 -> x<-z, y<-x, z<-y twice
    direct = ctx.import_tree(
        (Tree.x() + Tree.y()).min(Tree.z()).remap_xyz(
            Tree.y(), Tree.z(), Tree.x()
        ).remap_xyz(Tree.y(), Tree.z(), Tree.x())
    )
    assert root == direct


def test_import_tree_cache_persists_across_imports():
    # the reference caches subtree imports on the Context
    # (context/mod.rs:1019-1034); ours persists across import_tree
    # calls so shared components import in O(new nodes)
    from fidget_tpu.core.tree import Tree

    x, y, _ = Tree.axes()
    base = (x.square() + y.square()).sqrt() - 0.5
    ctx = Context()
    n1 = ctx.import_tree(base)
    len_after_first = len(ctx)
    n2 = ctx.import_tree(base)
    assert n1 == n2
    assert len(ctx) == len_after_first  # no new nodes allocated
    # a tree SHARING the subtree reuses its import
    bigger = base.min(x - 0.1)
    ctx.import_tree(bigger)
    assert len(ctx) > len_after_first


def test_mod_derivative_all_sign_quadrants():
    """d/db rem_euclid(a, b) = -div_euclid(a, b); the old floor-based
    reconstruction was off by +/-1 for negative quotients and b < 0."""
    import numpy as np

    from fidget_tpu.eval.arith import FloatMode
    from fidget_tpu.eval.unrolled import eval_tape
    from fidget_tpu import lower

    ctx = Context()
    x, y = ctx.x(), ctx.y()
    m = ctx.modulo(x, y)
    t = lower(ctx, [m, ctx.deriv(m, Var.Y), ctx.deriv(m, Var.X)])
    axis = {v.kind: i for v, i in t.var_map.items()}
    fm = FloatMode(np)

    def ev(ax, ay):
        ins = [np.zeros(1, np.float32)] * len(t.var_map)
        ins = list(ins)
        ins[axis["x"]] = np.array([ax], np.float32)
        ins[axis["y"]] = np.array([ay], np.float32)
        with np.errstate(all="ignore"):
            outs, _ = eval_tape(t, fm, ins)
        return [float(o[0]) for o in outs]

    eps = 1e-3
    for ax, ay in [(-5.3, 2.0), (5.3, -2.0), (-0.7, 3.1), (5.3, 2.0),
                   (-5.3, -2.0), (7.1, -3.0)]:
        v, db, da = ev(ax, ay)
        fd_b = (ev(ax, ay + eps)[0] - ev(ax, ay - eps)[0]) / (2 * eps)
        fd_a = (ev(ax + eps, ay)[0] - ev(ax - eps, ay)[0]) / (2 * eps)
        assert db == pytest.approx(fd_b, abs=1e-2), (ax, ay)
        assert da == pytest.approx(fd_a, abs=1e-2), (ax, ay)
