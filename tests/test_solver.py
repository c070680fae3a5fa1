"""Solver tests (mirroring fidget-solver/src/lib.rs tests)."""

import numpy as np
import pytest

from fidget_tpu import Tree, Var
from fidget_tpu.solver import Parameter, solve


def test_basic_solver():
    eqn = Tree.x() + Tree.y()
    sol = solve(
        [eqn], {Var.X: Parameter.Free(0.0), Var.Y: Parameter.Fixed(-1.0)}
    )
    assert set(sol) == {Var.X}
    assert sol[Var.X] == pytest.approx(1.0, abs=1e-5)


def test_four_vars_at_once():
    vs = [Var.new() for _ in range(4)]
    root = Tree.var(vs[0])
    for v in vs[1:]:
        root = root + Tree.var(v)
    sol = solve(
        [root], {v: Parameter.Free(float(i)) for i, v in enumerate(vs)}
    )
    total = sum(sol[v] for v in vs)
    assert total == pytest.approx(0.0, abs=1e-4)


def test_two_constraints():
    # point on two circles: |p - (0,0)| = 1 and |p - (2,0)| = 1 -> (1, 0)
    px, py = Var.new(), Var.new()
    x, y = Tree.var(px), Tree.var(py)
    c1 = (x.square() + y.square()).sqrt() - 1.0
    c2 = (((x - 2.0).square()) + y.square()).sqrt() - 1.0
    sol = solve(
        [c1, c2],
        {px: Parameter.Free(0.5), py: Parameter.Free(0.5)},
    )
    assert sol[px] == pytest.approx(1.0, abs=1e-3)
    assert sol[py] == pytest.approx(0.0, abs=1e-3)


def test_fixed_only_returns_empty():
    sol = solve([Tree.x()], {Var.X: Parameter.Fixed(2.0)})
    assert sol == {}


def test_unbound_variable_raises():
    with pytest.raises(ValueError):
        solve([Tree.x() + Tree.y()], {Var.X: Parameter.Free(0.0)})


def test_reusable_solver_no_retrace():
    from fidget_tpu.solver import Solver

    # the interactive-drag pattern: fixed values change between solves
    px, py = Var.new(), Var.new()
    ax = Var.new()
    x, y, a = Tree.var(px), Tree.var(py), Tree.var(ax)
    c1 = ((x - a).square() + y.square()).sqrt() - 1.0
    c2 = (x.square() + y.square()).sqrt() - 1.0
    s = Solver([c1, c2], free=[px, py], fixed=[ax])
    for anchor, expect_x in [(1.0, 0.5), (0.5, 0.25)]:
        sol = s.solve(
            {
                px: Parameter.Free(0.3),
                py: Parameter.Free(0.8),
                ax: Parameter.Fixed(anchor),
            }
        )
        assert sol[px] == pytest.approx(expect_x, abs=1e-3)


def test_solve_caches_solver_per_equation_set():
    from fidget_tpu import solver as solver_mod

    px = Var.new()
    x = Tree.var(px)
    eq = (x - 2.0).square() - 1.0
    solver_mod._SOLVE_CACHE.clear()
    s1 = solve([eq], {px: Parameter.Free(0.0)})
    assert len(solver_mod._SOLVE_CACHE) == 1
    cached = next(iter(solver_mod._SOLVE_CACHE.values()))
    s2 = solve([eq], {px: Parameter.Free(5.0)})
    # same structural equations -> same cached Solver instance
    assert next(iter(solver_mod._SOLVE_CACHE.values())) is cached
    assert len(solver_mod._SOLVE_CACHE) == 1
    assert s1[px] == pytest.approx(1.0, abs=1e-3)
    assert s2[px] == pytest.approx(3.0, abs=1e-3)
