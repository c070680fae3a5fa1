"""Canonical per-op evaluator matrix.

Mirrors the reference's shared evaluator test suite
(fidget-core/src/eval/test/mod.rs:99-384): every unary and binary op is
tested in float, interval and grad modes against canonical f64
semantics, with reg/reg, reg/imm and imm/reg operand-position variants
and "spicy" inputs (NaN, 0, +-1, pi multiples, infinities).
"""

import math

import numpy as np
import pytest

from fidget_tpu import Context, Var, lower
from fidget_tpu.core.ops import (
    BinaryOp,
    UnaryOp,
    eval_binary,
    eval_unary,
)
from fidget_tpu.eval.arith import FloatMode, GradMode, IntervalMode
from fidget_tpu.eval.unrolled import eval_tape

SPICY = np.array(
    [
        0.0, -0.0, 1.0, -1.0, 0.5, -0.5, 2.0, -2.0, 100.0, -100.0,
        math.pi, -math.pi, math.pi / 2, -math.pi / 2, 2 * math.pi,
        0.1, -0.1, 1e6, -1e6, math.nan, math.inf, -math.inf,
    ],
    dtype=np.float32,
)

#: Predicates marking inputs where f32-vs-f64 rounding may flip a branch
#: (the reference's `discontinuous_at` concept, eval/test/mod.rs:99-324).
def _near_int(a):
    return math.isfinite(a) and abs(a - round(a)) < 1e-5


DISCONTINUOUS = {
    UnaryOp.FLOOR: _near_int,
    UnaryOp.CEIL: _near_int,
    UnaryOp.ROUND: lambda a: math.isfinite(a)
    and abs(abs(a - math.floor(a)) - 0.5) < 1e-5,
    UnaryOp.NOT: lambda a: abs(a) < 1e-6,
}

BIN_DISCONTINUOUS = {
    BinaryOp.COMPARE: lambda a, b: abs(a - b) < 1e-4 and not (a == b),
    BinaryOp.MOD: lambda a, b: b == 0
    or not math.isfinite(a / b if b != 0 else math.nan)
    or abs(a / b - round(a / b)) < 1e-5,
    BinaryOp.AND: lambda a, b: abs(a) < 1e-6 and a != 0,
    BinaryOp.OR: lambda a, b: abs(a) < 1e-6 and a != 0,
    BinaryOp.MIN: lambda a, b: abs(a - b) < 1e-4 and a != b,
    BinaryOp.MAX: lambda a, b: abs(a - b) < 1e-4 and a != b,
}


def _agree(got: float, want: float, rtol=1e-5, atol=1e-6) -> bool:
    if math.isnan(want):
        return math.isnan(got)
    if math.isinf(want):
        return got == want or (
            math.isfinite(got) and abs(got) > 1e30 and math.copysign(1, got) == math.copysign(1, want)
        )
    if math.isnan(got) or math.isinf(got):
        # f32 overflow where f64 stays finite
        return abs(want) > 1e30
    return abs(got - want) <= atol + rtol * abs(want)


def _tape_unary(op: UnaryOp):
    ctx = Context()
    node = ctx.op_unary(op, ctx.x())
    return ctx, lower(ctx, [node])


@pytest.mark.parametrize("op", list(UnaryOp))
def test_unary_float(op):
    ctx, tape = _tape_unary(op)
    mode = FloatMode(np)
    with np.errstate(all="ignore"):
        got, _ = eval_tape(tape, mode, [SPICY])
    for i, a in enumerate(SPICY):
        a = float(a)
        pred = DISCONTINUOUS.get(op)
        if pred and pred(a):
            continue
        want = eval_unary(op, a)
        assert _agree(float(got[0][i]), want), (op.name, a, float(got[0][i]), want)


_BIN_VARIANTS = ["reg_reg", "reg_imm", "imm_reg"]


def _tape_binary(op: BinaryOp, variant: str, imm: float):
    ctx = Context()
    x, y = ctx.x(), ctx.y()
    if variant == "reg_reg":
        node = ctx.op_binary(op, x, y)
    elif variant == "reg_imm":
        node = ctx.op_binary(op, x, ctx.constant(imm))
    else:
        node = ctx.op_binary(op, ctx.constant(imm), y)
    if ctx.get_const(node) is not None or ctx.tag(node) != 3:
        return None  # identity-simplified away; nothing to test
    return lower(ctx, [node])


@pytest.mark.parametrize("variant", _BIN_VARIANTS)
@pytest.mark.parametrize("op", list(BinaryOp))
def test_binary_float(op, variant):
    imms = [0.5, -2.0, 0.0, 1.0]
    mode = FloatMode(np)
    n = len(SPICY)
    for imm in imms:
        tape = _tape_binary(op, variant, imm)
        if tape is None:
            continue
        if variant == "reg_reg":
            av = np.repeat(SPICY, n)
            bv = np.tile(SPICY, n)
        elif variant == "reg_imm":
            av = SPICY
            bv = np.full_like(SPICY, imm)
        else:
            av = np.full_like(SPICY, imm)
            bv = SPICY
        inputs = [None] * len(tape.var_map)
        for v, i in tape.var_map.items():
            inputs[i] = av if v == Var.X else bv
        with np.errstate(all="ignore"):
            got, _ = eval_tape(tape, mode, inputs)
        pred = BIN_DISCONTINUOUS.get(op)
        for i in range(len(av)):
            a, b = float(av[i]), float(bv[i])
            if pred and pred(a, b):
                continue
            want = eval_binary(op, a, b)
            assert _agree(float(got[0][i]), want), (
                op.name, variant, a, b, float(got[0][i]), want,
            )


# ----------------------------------------------------------------------
# Interval containment property: for random intervals, sampled point
# values must lie within the computed bounds (or the bounds are NaN).


@pytest.mark.parametrize("op", list(UnaryOp))
def test_unary_interval_containment(op):
    ctx, tape = _tape_unary(op)
    rng = np.random.default_rng(hash(op.name) % 2**32)
    mode = IntervalMode(np)
    fmode = FloatMode(np)
    lo = rng.uniform(-8, 8, size=128).astype(np.float32)
    hi = (lo + rng.uniform(0, 4, size=128)).astype(np.float32)
    with np.errstate(all="ignore"):
        (ivl,), _ = eval_tape(tape, mode, [(lo, hi)])
        for frac in np.linspace(0, 1, 9):
            pt = (lo * (1 - frac) + hi * frac).astype(np.float32)
            (pv,), _ = eval_tape(tape, fmode, [pt])
            il, iu = ivl
            ok = (
                np.isnan(il)
                | np.isnan(pv)
                | ((pv >= il - 1e-5) & (pv <= iu + 1e-5))
            )
            bad = np.nonzero(~ok)[0]
            assert bad.size == 0, (
                op.name,
                lo[bad[:3]],
                hi[bad[:3]],
                pv[bad[:3]],
                il[bad[:3]],
                iu[bad[:3]],
            )


@pytest.mark.parametrize("op", list(BinaryOp))
def test_binary_interval_containment(op):
    ctx = Context()
    node = ctx.op_binary(op, ctx.x(), ctx.y())
    tape = lower(ctx, [node])
    rng = np.random.default_rng(hash(op.name) % 2**32)
    mode = IntervalMode(np)
    fmode = FloatMode(np)
    alo = rng.uniform(-8, 8, size=256).astype(np.float32)
    ahi = (alo + rng.uniform(0, 4, size=256)).astype(np.float32)
    blo = rng.uniform(-8, 8, size=256).astype(np.float32)
    bhi = (blo + rng.uniform(0, 4, size=256)).astype(np.float32)
    inputs = [None] * 2
    inputs[tape.var_map[Var.X]] = (alo, ahi)
    inputs[tape.var_map[Var.Y]] = (blo, bhi)
    with np.errstate(all="ignore"):
        (ivl,), _ = eval_tape(tape, mode, inputs, trace=True)
        il, iu = ivl
        for fa in [0.0, 0.3, 0.7, 1.0]:
            for fb in [0.0, 0.5, 1.0]:
                pa = (alo * (1 - fa) + ahi * fa).astype(np.float32)
                pb = (blo * (1 - fb) + bhi * fb).astype(np.float32)
                pin = [None] * 2
                pin[tape.var_map[Var.X]] = pa
                pin[tape.var_map[Var.Y]] = pb
                (pv,), _ = eval_tape(tape, fmode, pin)
                ok = (
                    np.isnan(il)
                    | np.isnan(pv)
                    | ((pv >= il - 1e-4) & (pv <= iu + 1e-4))
                )
                bad = np.nonzero(~ok)[0]
                assert bad.size == 0, (
                    op.name,
                    pa[bad[:3]], pb[bad[:3]], pv[bad[:3]],
                    il[bad[:3]], iu[bad[:3]],
                )


def test_interval_nan_poisoning():
    ctx = Context()
    node = ctx.min(ctx.x(), ctx.y())
    tape = lower(ctx, [node])
    mode = IntervalMode(np)
    nan = np.float32(np.nan)
    inputs = [None, None]
    inputs[tape.var_map[Var.X]] = (np.float32(0.0), np.float32(1.0))
    inputs[tape.var_map[Var.Y]] = (nan, nan)
    (ivl,), choices = eval_tape(tape, mode, inputs, trace=True)
    assert np.isnan(ivl[0]) and np.isnan(ivl[1])
    assert int(choices[0]) == 3  # Both


def test_interval_known_values():
    """Spot-checks from the reference's interval docs/tests."""
    mode = IntervalMode(np)
    f = lambda v: np.float32(v)
    pair = lambda l, u: (f(l), f(u))
    from fidget_tpu.compiler.tape import TapeOp

    # abs
    lo, hi = mode.unary(TapeOp.ABS, pair(-3, 2))
    assert (lo, hi) == (0.0, 3.0)
    # square has tighter bounds than mul
    lo, hi = mode.unary(TapeOp.SQUARE, pair(-3, 2))
    assert (lo, hi) == (0.0, 9.0)
    # recip over 0 -> NaN
    lo, hi = mode.unary(TapeOp.RECIP, pair(-1, 1))
    assert np.isnan(lo) and np.isnan(hi)
    lo, hi = mode.unary(TapeOp.RECIP, pair(1, 2))
    assert (lo, hi) == (0.5, 1.0)
    # sin over a full period
    lo, hi = mode.unary(TapeOp.SIN, pair(0, 7))
    assert (lo, hi) == (-1.0, 1.0)
    # sin on an increasing quadrant
    lo, hi = mode.unary(TapeOp.SIN, pair(0, 0.5))
    np.testing.assert_allclose([lo, hi], [0.0, math.sin(0.5)], rtol=1e-6)
    # ln domain
    lo, hi = mode.unary(TapeOp.LN, pair(-1, 1))
    assert np.isnan(lo)
    # min_choice picks Left with separated intervals
    (lo, hi), ch = mode.choice_binary(TapeOp.MIN, pair(0, 1), pair(2, 3))
    assert (lo, hi) == (0.0, 1.0) and int(ch) == 1
    (lo, hi), ch = mode.choice_binary(TapeOp.MIN, pair(0, 1), pair(0.5, 1.5))
    assert (lo, hi) == (0.0, 1.0) and int(ch) == 3


# ----------------------------------------------------------------------
# Grad mode vs central finite differences (away from discontinuities)


@pytest.mark.parametrize("op", list(UnaryOp))
def test_unary_grad_finite_diff(op):
    ctx, tape = _tape_unary(op)
    mode = GradMode(np)
    # domain-safe sample points per op
    pts = np.array([0.3, 0.7, -0.4, 1.2, -1.7, 2.5], dtype=np.float32)
    if op in (UnaryOp.ASIN, UnaryOp.ACOS):
        pts = np.array([0.3, -0.4, 0.7, -0.8], dtype=np.float32)
    if op in (UnaryOp.LN, UnaryOp.SQRT):
        pts = np.array([0.3, 0.7, 1.2, 2.5], dtype=np.float32)
    ones = np.ones_like(pts)
    zeros = np.zeros_like(pts)
    with np.errstate(all="ignore"):
        (g,), _ = eval_tape(tape, mode, [(pts, ones, zeros, zeros)])
    v, dx = g[0], g[1]
    eps = 1e-3
    fmode = FloatMode(np)
    with np.errstate(all="ignore"):
        (vp,), _ = eval_tape(tape, fmode, [pts + eps])
        (vm,), _ = eval_tape(tape, fmode, [pts - eps])
    fd = (vp - vm) / (2 * eps)
    if op in (UnaryOp.FLOOR, UnaryOp.CEIL, UnaryOp.ROUND, UnaryOp.NOT):
        np.testing.assert_allclose(dx, 0.0)
    else:
        np.testing.assert_allclose(dx, fd, rtol=2e-2, atol=2e-2)


def test_grad_min_max_side_selection():
    ctx = Context()
    node = ctx.min(ctx.x(), ctx.y())
    tape = lower(ctx, [node])
    mode = GradMode(np)
    x = (np.float32(1.0), np.float32(1.0), np.float32(0.0), np.float32(0.0))
    y = (np.float32(2.0), np.float32(0.0), np.float32(1.0), np.float32(0.0))
    inputs = [None, None]
    inputs[tape.var_map[Var.X]] = x
    inputs[tape.var_map[Var.Y]] = y
    (g,), _ = eval_tape(tape, mode, inputs)
    assert g[0] == 1.0 and g[1] == 1.0 and g[2] == 0.0


def test_grad_via_jax_autodiff():
    """The unrolled evaluator is differentiable by jax.grad, and matches
    the forward-mode GradMode on smooth regions."""
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp

    ctx = Context()
    x, y = ctx.x(), ctx.y()
    f = ctx.sub(ctx.sqrt(ctx.add(ctx.square(x), ctx.square(y))), 1.0)
    tape = lower(ctx, [f])
    mode = FloatMode(jnp)

    def val(px, py):
        inputs = [None, None]
        inputs[tape.var_map[Var.X]] = px
        inputs[tape.var_map[Var.Y]] = py
        (out,), _ = eval_tape(tape, mode, inputs)
        return out

    g = jax.grad(val, argnums=(0, 1))(jnp.float32(3.0), jnp.float32(4.0))
    np.testing.assert_allclose([float(g[0]), float(g[1])], [0.6, 0.8], rtol=1e-6)


def test_interval_div_half_nan_poisons():
    # regression: a half-NaN divisor passing the sign test must poison
    import numpy as np

    from fidget_tpu.compiler.tape import TapeOp
    from fidget_tpu.eval.arith import IntervalMode

    im = IntervalMode(np)
    lo, hi = im.binary(
        TapeOp.DIV,
        (np.float32(2.0), np.float32(4.0)),
        (np.float32(1.0), np.float32(np.nan)),
    )
    assert np.isnan(lo) and np.isnan(hi)
    lo, hi = im.binary(
        TapeOp.DIV,
        (np.float32(-4.0), np.float32(-2.0)),
        (np.float32(1.0), np.float32(np.nan)),
    )
    assert np.isnan(lo) and np.isnan(hi)


def test_round_large_f32_integers_identity():
    """Regression: the floor(a+0.5) rounding idiom corrupts odd f32
    integers >= 2^23 (the +0.5 addition itself rounds ties-to-even);
    Rust f32::round returns them unchanged, and so must every mode."""
    import numpy as np

    from fidget_tpu.compiler.tape import TapeOp
    from fidget_tpu.eval.arith import FloatMode, GradMode, IntervalMode

    vals = np.array(
        [8388609.0, -8388609.0, 8388611.0, 2.0**24 + 2, 8388608.5 * 2],
        np.float32,
    )
    fm = FloatMode(np)
    out = fm.unary(TapeOp.ROUND, vals)
    np.testing.assert_array_equal(out, vals)  # already integers
    im = IntervalMode(np)
    lo, hi = im.unary(TapeOp.ROUND, (vals, vals))
    np.testing.assert_array_equal(lo, vals)
    np.testing.assert_array_equal(hi, vals)
    gm = GradMode(np)
    gv = gm.unary(TapeOp.ROUND, (vals, vals * 0, vals * 0, vals * 0))
    np.testing.assert_array_equal(gv[0], vals)
    # the sub-2^23 half-away-from-zero behavior is unchanged
    small = np.array([0.5, -0.5, 1.5, -1.5, 2.5], np.float32)
    np.testing.assert_array_equal(
        fm.unary(TapeOp.ROUND, small),
        np.array([1.0, -1.0, 2.0, -2.0, 3.0], np.float32),
    )
