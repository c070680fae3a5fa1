"""Least-squares solver for systems of equations.

The analog of `fidget-solver` (fidget-solver/src/lib.rs:191-288): a
basic Levenberg-Marquardt minimizer over a set of scalar constraint
functions of `Var`s. Where the reference packs three forward-mode
gradients per Grad lane to assemble the Jacobian (lib.rs:107-146), the
TPU version evaluates all constraints in one traced function and takes
the whole Jacobian with `jax.jacfwd` — the evaluator itself is
differentiable, so no per-variable packing is needed.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..compiler.lower import lower
from ..compiler.tape import Tape
from ..core.context import Context
from ..core.tree import Tree, import_tree
from ..core.var import Var
from ..eval.arith import FloatMode
from ..eval.unrolled import eval_tape

__all__ = ["Parameter", "SingularMatrix", "Solver", "solve"]


@dataclass(frozen=True)
class Parameter:
    """Free (optimized, with a starting position) or Fixed input."""

    value: float
    free: bool

    @staticmethod
    def Free(v: float) -> "Parameter":
        return Parameter(float(v), True)

    @staticmethod
    def Fixed(v: float) -> "Parameter":
        return Parameter(float(v), False)


class SingularMatrix(RuntimeError):
    pass


def _as_tape(eq) -> Tape:
    if isinstance(eq, Tape):
        return eq
    if isinstance(eq, Tree):
        ctx = Context()
        return lower(ctx, [import_tree(ctx, eq)])
    raise TypeError(f"cannot solve over {type(eq).__name__}")


class Solver:
    """Reusable LM solver for one equation set + free/fixed structure.

    Built once, solved many times with changing values (interactive
    constraint dragging): fixed-variable values are *traced* inputs, so
    repeated solves never retrace or recompile.
    """

    def __init__(self, eqs: list, free: list, fixed: list):
        self.tapes = [_as_tape(e) for e in eqs]
        self.free = list(free)
        self.fixed = list(fixed)
        known = set(self.free) | set(self.fixed)
        for k, t in enumerate(self.tapes):
            if not len(t.var_map):
                # a constant equation (possibly by Context folding,
                # e.g. x - x) has no gradient and would crash
                # eval_tape mid-trace with an opaque error
                raise ValueError(
                    f"equation {k} is constant (no variables) — it "
                    "cannot constrain anything"
                )
            for v in t.var_map:
                if v not in known:
                    raise ValueError(f"equation uses unbound variable {v!r}")
        idx = {v: i for i, v in enumerate(self.free)}
        fidx = {v: i for i, v in enumerate(self.fixed)}
        tapes = self.tapes

        def residuals(cur, fixed_vals):
            out = []
            for t in tapes:
                inputs = [None] * len(t.var_map)
                for v, i in t.var_map.items():
                    if v in idx:
                        inputs[i] = cur[idx[v]]
                    else:
                        inputs[i] = fixed_vals[fidx[v]]
                (r,), _ = eval_tape(t, FloatMode(jnp), inputs)
                out.append(r)
            return jnp.stack(out)

        self._res = jax.jit(residuals)
        self._jac = jax.jit(jax.jacfwd(residuals, argnums=0))

    def solve(
        self, vars: dict[Var, Parameter], *, max_iters: int = 100
    ) -> dict[Var, float]:
        free, fixed = self.free, self.fixed
        for v in free:
            if not vars[v].free:
                raise ValueError(
                    f"{v!r} is Fixed but structurally free in this Solver; "
                    "build a new Solver when roles change"
                )
        for v in fixed:
            if vars[v].free:
                raise ValueError(
                    f"{v!r} is Free but structurally fixed in this Solver; "
                    "build a new Solver when roles change"
                )
        idx = {v: i for i, v in enumerate(free)}
        cur = np.array([vars[v].value for v in free], np.float32)
        fv = jnp.asarray(
            [np.float32(vars[v].value) for v in fixed] or [0.0], jnp.float32
        )
        if not free:
            return {}
        res_f = lambda c: self._res(c, fv)  # noqa: E731
        jac_f = lambda c: self._jac(c, fv)  # noqa: E731
        return _lm_loop(res_f, jac_f, cur, idx, max_iters)


def _tape_key(t: Tape) -> tuple:
    """Structural identity of a tape (for the solve() Solver cache)."""
    return (
        t.op.tobytes(), t.out.tobytes(), t.a.tobytes(), t.b.tobytes(),
        t.imm.tobytes(), t.aux.tobytes(), t.reg_count, t.mem_count,
        t.choice_count, t.output_count, tuple(t.var_map.items()),
    )


_SOLVE_CACHE: dict = {}
_SOLVE_CACHE_MAX = 64


def solve(
    eqs: list,
    vars: dict[Var, Parameter],
    *,
    max_iters: int = 100,
) -> dict[Var, float]:
    """Minimizes sum of squares of `eqs` over the free variables.

    Levenberg-Marquardt with multiplicative damping adaptation, exit
    criteria matching the reference (zero residual, no position change,
    or a flat 4-sample error history; lib.rs:236-279).

    Solvers are cached per (equation set, free/fixed structure), so
    interactive constraint dragging — repeated solves with the same
    equations and changing values — compiles once and then never
    retraces.

    Solve a - 1 = 0 with `a` free (the reference's doc example,
    fidget-solver/src/lib.rs):

    >>> from fidget_tpu import Tree, Var
    >>> from fidget_tpu.solver import Parameter, solve
    >>> a = Var.new()
    >>> eq = Tree.var(a) - 1.0
    >>> out = solve([eq], {a: Parameter.Free(0.0)})
    >>> round(float(out[a]), 4)
    1.0
    """
    free = [v for v, p in vars.items() if p.free]
    fixed = [v for v, p in vars.items() if not p.free]
    tapes = [_as_tape(e) for e in eqs]
    key = (
        tuple(_tape_key(t) for t in tapes), tuple(free), tuple(fixed)
    )
    solver = _SOLVE_CACHE.get(key)
    if solver is None:
        if len(_SOLVE_CACHE) >= _SOLVE_CACHE_MAX:
            _SOLVE_CACHE.pop(next(iter(_SOLVE_CACHE)))
        solver = Solver(tapes, free, fixed)
        _SOLVE_CACHE[key] = solver
    return solver.solve(vars, max_iters=max_iters)


def _lm_loop(res_f, jac_f, cur, idx, max_iters):

    free = list(idx)
    damping = 1.0
    prev_err = np.inf
    err_buf = np.full(4, np.nan, np.float64)
    for it in range(max_iters):
        r = np.asarray(res_f(jnp.asarray(cur)), np.float64)
        if (r == 0.0).all():
            break
        J = np.asarray(jac_f(jnp.asarray(cur)), np.float64)
        jt_j = J.T @ J
        jt_r = J.T @ r
        # inner loop: grow damping until the step reduces the error
        # (bounded; a persistently error-increasing step is rejected)
        accepted = False
        for _inner in range(60):
            adjusted = jt_j + damping * np.diag(np.diag(jt_j))
            try:
                delta, *_ = np.linalg.lstsq(adjusted, jt_r, rcond=None)
            except np.linalg.LinAlgError as e:
                raise SingularMatrix(str(e)) from e
            if not np.isfinite(delta).all():
                raise SingularMatrix("non-finite step")
            err = float(
                np.square(
                    np.asarray(res_f(jnp.asarray(cur - delta)), np.float64)
                ).sum()
            )
            if err > prev_err:
                damping *= 1.5
            else:
                damping /= 3.0
                accepted = True
                break
        if not accepted:
            break  # no damping reduces the error: stay at cur
        new = (cur - delta).astype(np.float32)
        changed = (new != cur).any()
        cur = new
        err_buf[it % 4] = err
        if (
            not changed
            or err == 0.0
            or damping == 0.0
            or (np.isfinite(err_buf).all() and (err_buf == err_buf[0]).all())
        ):
            break
        prev_err = err

    return {v: float(cur[idx[v]]) for v in free}
