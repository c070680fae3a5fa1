"""Per-op matrix instantiated against the Pallas kernels.

The reference certifies every backend (VM *and* JIT) with the same
canonical per-op suite (fidget-core/src/eval/test/mod.rs:346-384).
This is that instantiation for the Pallas interpreter kernels: every
TapeOp x {float, interval, grad} x operand-position variant runs
through interp_float / interp_interval / interp_grad in interpret mode
and is compared against the host unrolled evaluator running the SAME
softmath namespace — including NaN/inf/pi inputs, so the
softmath.py polynomial paths (ATAN2/ASIN/ACOS/ATAN) are exercised
*inside* the kernels, not just on the host.

All test tapes pack into one arena per mode, so the whole matrix costs
three kernel invocations (plus one op_order-permuted float pass).
"""

import math

import numpy as np
import pytest

from fidget_tpu import Context, Var, lower
from fidget_tpu.compiler.pack import pack_tapes
from fidget_tpu.core.ops import BinaryOp, UnaryOp
from fidget_tpu.eval.arith import FloatMode, GradMode, IntervalMode
from fidget_tpu.eval.pallas_interp import (
    _N_OPS,
    interp_float,
    interp_grad,
    interp_interval,
    unpack_choices,
)
from fidget_tpu.eval.softmath import kernel_namespace
from fidget_tpu.eval.unrolled import eval_tape

S0 = 8
LANES = S0 * 128

SPICY = np.array(
    [
        0.0, -0.0, 1.0, -1.0, 0.5, -0.5, 2.0, -2.0, 100.0, -100.0,
        math.pi, -math.pi, math.pi / 2, -math.pi / 2, 2 * math.pi,
        0.1, -0.1, 1e6, -1e6, math.nan, math.inf, -math.inf,
    ],
    dtype=np.float32,
)
NS = len(SPICY)
NPAIR = NS * NS  # 484 <= LANES


def _pad(a):
    return np.pad(a.astype(np.float32), (0, LANES - len(a)))


#: point inputs: every spicy pair in the first NPAIR lanes
A_PTS = _pad(np.repeat(SPICY, NS))
B_PTS = _pad(np.tile(SPICY, NS))

#: interval inputs: A spans each spicy pair, B is degenerate at b
A_LO = _pad(np.minimum(np.repeat(SPICY, NS), np.tile(SPICY, NS)))
A_HI = _pad(np.maximum(np.repeat(SPICY, NS), np.tile(SPICY, NS)))
B_LO = B_PTS
B_HI = B_PTS


def _build_cases():
    """(label, tape) for every op x operand-position variant that
    survives constant folding, plus a spill-forcing tape (COPY)."""
    cases = []
    for op in UnaryOp:
        ctx = Context()
        node = ctx.op_unary(op, ctx.x())
        cases.append((f"u:{op.name}", lower(ctx, [node])))
    for op in BinaryOp:
        for variant, imm in (
            ("reg_reg", None),
            ("reg_imm", 0.5), ("reg_imm", -2.0),
            ("imm_reg", 0.5), ("imm_reg", -2.0),
        ):
            ctx = Context()
            x, y = ctx.x(), ctx.y()
            if variant == "reg_reg":
                node = ctx.op_binary(op, x, y)
            elif variant == "reg_imm":
                node = ctx.op_binary(op, x, ctx.constant(imm))
            else:
                node = ctx.op_binary(op, ctx.constant(imm), y)
            if ctx.get_const(node) is not None or ctx.tag(node) != 3:
                continue  # identity-folded; nothing reaches the kernel
            cases.append((f"b:{op.name}:{variant}:{imm}", lower(ctx, [node])))
    # spill tape: LOAD/STORE -> unified-file COPY inside the kernel
    ctx = Context()
    x, y = ctx.x(), ctx.y()
    f = ctx.min(
        ctx.add(ctx.sin(x), ctx.cos(y)),
        ctx.sub(ctx.sqrt(ctx.add(ctx.square(x), ctx.square(y))), 1.0),
    )
    cases.append(("spill", lower(ctx, [f], reg_limit=2)))
    return cases


CASES = _build_cases()
TAPES = [t for _, t in CASES]


def _covered_ops():
    from fidget_tpu.compiler.tape import TapeOp

    ops = set()
    for t in TAPES:
        for o in t.op:
            o = int(o)
            # packing rewrites spill LOAD/STOREs into kernel COPYs
            if o in (int(TapeOp.LOAD), int(TapeOp.STORE)):
                o = int(TapeOp.COPY)
            ops.add(o)
    return ops


def test_matrix_covers_all_kernel_ops():
    """Every kernel-dispatchable opcode appears in some test tape
    (LOAD/STORE pack into COPY; INPUT/OUTPUT/COPY come for free)."""
    from fidget_tpu.compiler.tape import TapeOp

    covered = _covered_ops()
    # LOAD/STORE are packed away into COPY, which the spill tape forces
    packable = {int(TapeOp.LOAD), int(TapeOp.STORE)}
    missing = [
        TapeOp(o).name
        for o in range(_N_OPS)
        if o not in covered and o not in packable
    ]
    assert not missing, f"ops never reaching the kernels: {missing}"


def _vars_float():
    V = 2
    vars_ = np.zeros((len(TAPES), V, S0, 128), np.float32)
    for t_i, tape in enumerate(TAPES):
        for v, i in tape.var_map.items():
            vars_[t_i, i] = (A_PTS if v == Var.X else B_PTS).reshape(S0, 128)
    return vars_


def _host_inputs(tape, mode):
    inputs = [None] * len(tape.var_map)
    for v, i in tape.var_map.items():
        if mode == "float":
            inputs[i] = A_PTS if v == Var.X else B_PTS
        elif mode == "interval":
            inputs[i] = (A_LO, A_HI) if v == Var.X else (B_LO, B_HI)
        else:  # grad: X carries dx=1, Y carries dy=1
            val = A_PTS if v == Var.X else B_PTS
            one = np.ones(LANES, np.float32)
            zero = np.zeros(LANES, np.float32)
            dx = one if v == Var.X else zero
            dy = one if v == Var.Y else zero
            inputs[i] = (val, dx, dy, zero)
    return inputs


def _assert_matches(got, want, label, rtol=2e-5, atol=2e-5):
    """NaN-aware comparison over the meaningful lanes. The kernel and
    the oracle share the softmath namespace, so residual differences
    are XLA-vs-numpy transcendental ULPs only."""
    got = np.asarray(got).reshape(-1)[:NPAIR]
    want = np.asarray(want).reshape(-1)[:NPAIR]
    both_nan = np.isnan(got) & np.isnan(want)
    exact = got == want  # covers equal infinities and exact values
    finite = np.isfinite(got) & np.isfinite(want)
    close = finite & (np.abs(got - want) <= atol + rtol * np.abs(want))
    # f32 overflow disagreement (one side inf, other huge) is agreement
    huge = (np.abs(got) > 1e30) | np.isinf(got)
    huge &= (np.abs(want) > 1e30) | np.isinf(want)
    huge &= np.sign(np.where(np.isfinite(got), got, np.copysign(1, got))) == (
        np.sign(np.where(np.isfinite(want), want, np.copysign(1, want)))
    )
    ok = both_nan | exact | close | huge
    bad = np.nonzero(~ok)[0]
    assert bad.size == 0, (
        label, bad[:5],
        A_PTS[bad[:5]], B_PTS[bad[:5]],
        got[bad[:5]], want[bad[:5]],
    )


def test_float_kernel_all_ops():
    packed = pack_tapes(TAPES, capacity=32)
    vars_ = _vars_float()
    out = np.asarray(interp_float(
        packed.w1, packed.w2, packed.imm, packed.lengths, vars_,
        nf=packed.nf, n_inputs=2, n_outputs=1, s0=S0, interpret=True,
    ))
    fm = FloatMode(kernel_namespace(np))
    for t_i, (label, tape) in enumerate(CASES):
        with np.errstate(all="ignore"):
            (want,), _ = eval_tape(tape, fm, _host_inputs(tape, "float"))
        _assert_matches(out[t_i, 0], want, label)


def test_float_kernel_all_ops_renumbered():
    """The same matrix through a fully-permuted opcode order: certifies
    pack-order/kernel-order agreement for every op (a renumbered arena
    on a canonical-order kernel computes silent garbage)."""
    order = tuple(reversed(range(_N_OPS)))
    packed = pack_tapes(TAPES, capacity=32, op_order=order)
    vars_ = _vars_float()
    out = np.asarray(interp_float(
        packed.w1, packed.w2, packed.imm, packed.lengths, vars_,
        nf=packed.nf, n_inputs=2, n_outputs=1, s0=S0, interpret=True,
        op_order=order,
    ))
    fm = FloatMode(kernel_namespace(np))
    for t_i, (label, tape) in enumerate(CASES):
        with np.errstate(all="ignore"):
            (want,), _ = eval_tape(tape, fm, _host_inputs(tape, "float"))
        _assert_matches(out[t_i, 0], want, label)


def test_interval_kernel_all_ops():
    packed = pack_tapes(TAPES, capacity=32)
    V = 2
    lo = np.zeros((len(TAPES), V, S0, 128), np.float32)
    hi = np.zeros((len(TAPES), V, S0, 128), np.float32)
    for t_i, tape in enumerate(TAPES):
        for v, i in tape.var_map.items():
            lo[t_i, i] = (A_LO if v == Var.X else B_LO).reshape(S0, 128)
            hi[t_i, i] = (A_HI if v == Var.X else B_HI).reshape(S0, 128)
    olo, ohi, chp = interp_interval(
        packed.w1, packed.w2, packed.imm, packed.lengths, lo, hi,
        nf=packed.nf, n_inputs=V, n_outputs=1, s0=S0, c_words=1,
        interpret=True,
    )
    olo, ohi, chp = np.asarray(olo), np.asarray(ohi), np.asarray(chp)
    im = IntervalMode(kernel_namespace(np))
    for t_i, (label, tape) in enumerate(CASES):
        with np.errstate(all="ignore"):
            (want,), choices = eval_tape(
                tape, im, _host_inputs(tape, "interval"), trace=True
            )
        _assert_matches(olo[t_i, 0], want[0], label + ":lo")
        _assert_matches(ohi[t_i, 0], want[1], label + ":hi")
        if tape.choice_count:
            got_ch = unpack_choices(chp[t_i], tape.choice_count)
            want_ch = np.stack([c.reshape(S0, 128) for c in choices])
            np.testing.assert_array_equal(
                got_ch[..., : NPAIR // 128, :], want_ch[..., : NPAIR // 128, :],
                err_msg=label,
            )


def test_grad_kernel_all_ops():
    packed = pack_tapes(TAPES, capacity=32)
    V = 2
    vars_ = np.zeros((len(TAPES), V, 4, S0, 128), np.float32)
    for t_i, tape in enumerate(TAPES):
        for v, i in tape.var_map.items():
            val = A_PTS if v == Var.X else B_PTS
            vars_[t_i, i, 0] = val.reshape(S0, 128)
            vars_[t_i, i, 1 if v == Var.X else 2] = 1.0
    out = np.asarray(interp_grad(
        packed.w1, packed.w2, packed.imm, packed.lengths, vars_,
        nf=packed.nf, n_inputs=V, n_outputs=1, s0=S0, interpret=True,
    ))
    gm = GradMode(kernel_namespace(np))
    for t_i, (label, tape) in enumerate(CASES):
        with np.errstate(all="ignore"):
            (want,), _ = eval_tape(tape, gm, _host_inputs(tape, "grad"))
        for k in range(4):
            _assert_matches(
                out[t_i, 0, k], want[k], f"{label}:d{k}", rtol=1e-4,
                atol=1e-4,
            )
