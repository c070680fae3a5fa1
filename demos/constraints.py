"""Interactive-constraint demo (the analog of demos/constraints).

A draggable linkage solved with the least-squares solver
(demos/constraints/src/main.rs:166-211): three points, where p0 is
pinned, |p1 - p0| = 1, |p2 - p1| = 1, and p2.y = 0. Dragging any point
re-solves the system with the dragged coordinates fixed.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")  # scalar solver work; skip the TPU

import numpy as np

from fidget_tpu import Tree, Var
from fidget_tpu.solver import Parameter, Solver


def make_system():
    pts = [(Var.new(), Var.new()) for _ in range(3)]
    t = [(Tree.var(vx), Tree.var(vy)) for vx, vy in pts]

    def dist2(a, b):
        return (a[0] - b[0]).square() + (a[1] - b[1]).square()

    eqs = [
        dist2(t[0], t[1]) - 1.0,  # |p1 - p0| = 1
        dist2(t[1], t[2]) - 1.0,  # |p2 - p1| = 1
        t[2][1],                  # p2 on the x axis
    ]
    return pts, eqs


def main():
    pts, eqs = make_system()
    # pin p0 at the origin, start the rest in rough positions
    params = {
        pts[0][0]: Parameter.Fixed(0.0),
        pts[0][1]: Parameter.Fixed(0.0),
        pts[1][0]: Parameter.Free(0.3),
        pts[1][1]: Parameter.Free(1.2),
        pts[2][0]: Parameter.Free(1.5),
        pts[2][1]: Parameter.Free(0.4),
    }
    solver = Solver(
        eqs,
        free=[pts[1][0], pts[1][1], pts[2][0], pts[2][1]],
        fixed=[pts[0][0], pts[0][1]],
    )
    sol = solver.solve(params)
    p1 = np.array([sol[pts[1][0]], sol[pts[1][1]]])
    p2 = np.array([sol[pts[2][0]], sol[pts[2][1]]])
    print(f"p1 = {p1}, |p1| = {np.linalg.norm(p1):.4f} (expect 1)")
    print(f"p2 = {p2}, |p2-p1| = {np.linalg.norm(p2 - p1):.4f} (expect 1)")
    print(f"p2.y = {p2[1]:.6f} (expect 0)")

    # simulate dragging p1 to a new spot: fix it, re-solve the rest
    # dragging changes which vars are fixed -> new structure, new Solver
    params[pts[1][0]] = Parameter.Fixed(0.8)
    params[pts[1][1]] = Parameter.Fixed(0.6)
    params[pts[2][0]] = Parameter.Free(float(p2[0]))
    params[pts[2][1]] = Parameter.Free(float(p2[1]))
    solver2 = Solver(
        eqs,
        free=[pts[2][0], pts[2][1]],
        fixed=[pts[0][0], pts[0][1], pts[1][0], pts[1][1]],
    )
    sol2 = solver2.solve(params)
    p2b = np.array([sol2[pts[2][0]], sol2[pts[2][1]]])
    print(f"after drag: p2 = {p2b}, |p2-p1| = "
          f"{np.linalg.norm(p2b - [0.8, 0.6]):.4f} (expect 1)")


if __name__ == "__main__":
    main()
