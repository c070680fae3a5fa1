"""Compiler tests: lowering, register allocation, bytecode, simplify."""

import math

import numpy as np
import pytest

from fidget_tpu import Context, Var, lower, simplify
from fidget_tpu.compiler import bytecode
from fidget_tpu.compiler.tape import (
    CHOICE_BOTH,
    CHOICE_LEFT,
    CHOICE_RIGHT,
    TapeOp,
)
from fidget_tpu.eval.arith import FloatMode, IntervalMode
from fidget_tpu.eval.unrolled import eval_tape
from fidget_tpu.io.models import has_model, load_vm


def _eval_float(tape, xyz):
    mode = FloatMode(np)
    inputs = [None] * len(tape.var_map)
    binding = {Var.X: xyz[0], Var.Y: xyz[1], Var.Z: xyz[2]}
    for v, i in tape.var_map.items():
        inputs[i] = np.asarray(binding[v], dtype=np.float32)
    outs, _ = eval_tape(tape, mode, inputs)
    return outs[0]


def _random_points(n, seed=0, scale=2.0):
    rng = np.random.default_rng(seed)
    return (rng.uniform(-scale, scale, size=(3, n))).astype(np.float32)


def _build_spiky(ctx):
    """An expression stressing min/max/register pressure."""
    x, y, z = ctx.x(), ctx.y(), ctx.z()
    r = ctx.sqrt(ctx.add(ctx.square(x), ctx.square(y)))
    circ = ctx.sub(r, 1.0)
    sq = ctx.max(ctx.sub(ctx.abs(x), 0.8), ctx.sub(ctx.abs(y), 0.8))
    swirl = ctx.add(ctx.sin(ctx.mul(x, 3.0)), ctx.cos(ctx.mul(y, 3.0)))
    f = ctx.min(circ, ctx.max(sq, ctx.mul(swirl, 0.2)))
    return ctx.min(f, ctx.add(z, 10.0))


def test_lower_matches_graph_eval():
    ctx = Context()
    f = _build_spiky(ctx)
    tape = lower(ctx, [f])
    pts = _random_points(256)
    got = _eval_float(tape, pts)
    want = np.array(
        [ctx.eval_xyz(f, *map(float, pts[:, i])) for i in range(pts.shape[1])],
        dtype=np.float32,
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_register_pressure_spill():
    """Force spills by lowering with a tiny register file."""
    ctx = Context()
    f = _build_spiky(ctx)
    for limit in (4, 5, 8):
        tape = lower(ctx, [f], reg_limit=limit)
        assert tape.reg_count <= limit
        ops = set(tape.op.tolist())
        if limit == 4:
            assert int(TapeOp.STORE) in ops or int(TapeOp.LOAD) in ops
        pts = _random_points(64, seed=1)
        got = _eval_float(tape, pts)
        want = np.array(
            [ctx.eval_xyz(f, *map(float, pts[:, i])) for i in range(64)],
            dtype=np.float32,
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_interleaved_liveness_across_sin():
    """The reference's allocator stress pattern: long-lived values
    interleaved across a transcendental (eval/test/mod.rs:18-43)."""
    ctx = Context()
    x, y = ctx.x(), ctx.y()
    a = ctx.add(x, 1.0)
    b = ctx.add(y, 2.0)
    s = ctx.sin(ctx.mul(a, b))
    f = ctx.add(ctx.add(s, a), b)
    for limit in (2, 3, 255):
        tape = lower(ctx, [f], reg_limit=limit)
        v = _eval_float(tape, np.array([[0.5], [0.25], [0.0]], np.float32))
        want = math.sin(1.5 * 2.25) + 1.5 + 2.25
        assert abs(float(v[0]) - want) < 1e-6


def test_multiple_outputs():
    ctx = Context()
    x, y = ctx.x(), ctx.y()
    f = ctx.add(x, y)
    g = ctx.mul(x, y)
    tape = lower(ctx, [f, g])
    assert tape.output_count == 2
    mode = FloatMode(np)
    inputs = [None] * len(tape.var_map)
    for v, i in tape.var_map.items():
        inputs[i] = np.float32(3.0) if v == Var.X else np.float32(4.0)
    outs, _ = eval_tape(tape, mode, inputs)
    assert float(outs[0]) == 7.0 and float(outs[1]) == 12.0


def test_constant_root():
    ctx = Context()
    c = ctx.constant(2.5)
    tape = lower(ctx, [c, ctx.x()])
    mode = FloatMode(np)
    outs, _ = eval_tape(tape, mode, [np.float32(9.0)])
    assert float(outs[0]) == 2.5 and float(outs[1]) == 9.0


def test_bytecode_roundtrip():
    ctx = Context()
    f = _build_spiky(ctx)
    tape = lower(ctx, [f], reg_limit=6)  # force Mem ops into the stream
    words = bytecode.encode(tape)
    assert words[0] == bytecode.JUMP and words[1] == 0
    assert words[-2] == bytecode.JUMP and words[-1] == bytecode.JUMP
    tape2 = bytecode.decode(words, tape.var_map)
    assert len(tape2) == len(tape)
    assert tape2.choice_count == tape.choice_count
    pts = _random_points(64, seed=3)
    np.testing.assert_array_equal(_eval_float(tape, pts), _eval_float(tape2, pts))


def test_bytecode_repack_by_frequency():
    ctx = Context()
    f = _build_spiky(ctx)
    tape = lower(ctx, [f])
    m = bytecode.repack_map(tape)
    # remap is a permutation starting at 0
    assert sorted(m.values()) == list(range(len(m)))


def test_bytecode_known_words():
    """Spot-check the packed encoding against the documented format
    (fidget-bytecode/src/lib.rs:10-42)."""
    ctx = Context()
    f = ctx.add(ctx.x(), 1.0)
    tape = lower(ctx, [f])
    words = bytecode.encode(tape)
    # header, Input, Add(reg,imm), Output, trailer = 2+2*3+2 words
    assert len(words) == 10
    w_in, imm_in = int(words[2]), int(words[3])
    assert w_in & 0xFF == 1  # Input opcode
    assert imm_in == 0  # input index 0
    w_add, imm_add = int(words[4]), int(words[5])
    assert w_add & 0xFF == 20  # Add opcode
    assert (w_add >> 24) & 0xFF == 0xFF  # rhs is immediate
    assert np.uint32(imm_add).view(np.float32) == np.float32(1.0)
    w_out, imm_out = int(words[6]), int(words[7])
    assert w_out & 0xFF == 0 and imm_out == 0


def _interval_eval(tape, lo, hi):
    mode = IntervalMode(np)
    inputs = [None] * len(tape.var_map)
    for v, i in tape.var_map.items():
        k = {"x": 0, "y": 1, "z": 2}[v.kind]
        inputs[i] = (
            np.asarray(lo[k], dtype=np.float32),
            np.asarray(hi[k], dtype=np.float32),
        )
    outs, choices = eval_tape(tape, mode, inputs, trace=True)
    return outs[0], choices


def test_simplify_preserves_values():
    ctx = Context()
    f = _build_spiky(ctx)
    tape = lower(ctx, [f])
    rng = np.random.default_rng(7)
    for _ in range(20):
        c = rng.uniform(-1.5, 1.5, size=3)
        w = rng.uniform(0.01, 0.5, size=3)
        lo = (c - w).astype(np.float32)
        hi = (c + w).astype(np.float32)
        (_ivl, choices) = _interval_eval(tape, lo, hi)
        ch = np.array([int(c) for c in choices], dtype=np.uint8)
        stape = simplify(tape, ch)
        assert len(stape) <= len(tape)
        # sample points inside the region: values must match exactly
        pts = np.stack(
            [
                rng.uniform(lo[k], hi[k], size=32).astype(np.float32)
                for k in range(3)
            ]
        )
        np.testing.assert_array_equal(
            _eval_float(stape, pts), _eval_float(tape, pts)
        )


def test_simplify_shrinks():
    ctx = Context()
    x, y = ctx.x(), ctx.y()
    f = ctx.min(ctx.sub(x, 10.0), ctx.sub(y, 0.5))  # x-10 dominates nowhere
    tape = lower(ctx, [f])
    assert tape.choice_count == 1
    # region where y - 0.5 is clearly the minimum
    (_iv, choices) = _interval_eval(
        tape, np.array([0.0, -20.0, 0.0]), np.array([1.0, -19.0, 0.0])
    )
    assert int(choices[0]) == CHOICE_RIGHT
    stape = simplify(tape, np.array([CHOICE_RIGHT], np.uint8))
    assert len(stape) < len(tape)
    assert stape.choice_count == 0
    # x input should be gone entirely
    kept_inputs = {
        int(stape.aux[i])
        for i in range(len(stape))
        if stape.op[i] == int(TapeOp.INPUT)
    }
    assert kept_inputs == {tape.var_map[Var.Y]}


def test_simplify_nested():
    """Simplify twice with progressively narrower regions."""
    ctx = Context()
    f = _build_spiky(ctx)
    tape = lower(ctx, [f])
    lo = np.array([0.1, 0.1, -0.1], np.float32)
    hi = np.array([0.9, 0.9, 0.1], np.float32)
    _iv, choices = _interval_eval(tape, lo, hi)
    t1 = simplify(tape, np.array([int(c) for c in choices], np.uint8))
    lo2, hi2 = lo, (lo + hi) / 2
    _iv2, ch2 = _interval_eval(t1, lo2, hi2)
    t2 = simplify(t1, np.array([int(c) for c in ch2], np.uint8))
    assert len(t2) <= len(t1) <= len(tape)
    rng = np.random.default_rng(11)
    pts = np.stack(
        [rng.uniform(lo2[k], hi2[k], size=16).astype(np.float32) for k in range(3)]
    )
    np.testing.assert_array_equal(_eval_float(t2, pts), _eval_float(tape, pts))


@pytest.mark.skipif(not has_model("prospero.vm"), reason="models unavailable")
def test_prospero_lowering():
    ctx, root = load_vm("prospero.vm")
    tape = lower(ctx, [root])
    assert tape.reg_count <= 255
    assert len(tape) >= 7000
    pts = _random_points(128, seed=5, scale=1.0)
    got = _eval_float(tape, pts)
    want = np.array(
        [ctx.eval_xyz(root, *map(float, pts[:, i])) for i in range(128)],
        dtype=np.float32,
    )
    # f32 tape vs f64 graph eval: tolerance
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
    # interval eval over the whole frame produces plenty of Left/Right
    _iv, choices = _interval_eval(
        tape, np.array([-0.4, -0.1, 0.0]), np.array([-0.3, 0.0, 0.0])
    )
    ch = np.array([int(c) for c in choices], np.uint8)
    stape = simplify(tape, ch)
    assert len(stape) < len(tape) * 0.5


def test_decode_without_varmap_synthesizes_inputs():
    """Decoding interop bytecode without a VarMap must still size the
    input planes (a fresh Var per input index); an empty VarMap used to
    make every INPUT bind a zero plane — silently evaluating f(0,0,0)."""
    import numpy as np

    from fidget_tpu import Context, lower
    from fidget_tpu.compiler.bytecode import decode, encode
    from fidget_tpu.eval.arith import FloatMode
    from fidget_tpu.eval.unrolled import eval_tape

    ctx = Context()
    x, y = ctx.x(), ctx.y()
    tape = lower(ctx, [ctx.add(ctx.mul(x, 2.0), y)])
    t2 = decode(encode(tape))
    assert len(t2.var_map) == len(tape.var_map)
    ins = [np.array([3.0], np.float32), np.array([5.0], np.float32)]
    (a,), _ = eval_tape(tape, FloatMode(np), ins)
    (b,), _ = eval_tape(t2, FloatMode(np), ins)
    assert float(a[0]) == float(b[0]) != 0.0


def test_decode_malformed_raises_valueerror():
    import numpy as np

    import pytest

    from fidget_tpu.compiler.bytecode import decode

    with pytest.raises(ValueError, match="malformed|header"):
        decode(np.array([1, 2, 3], np.uint32))
    with pytest.raises(ValueError, match="header"):
        decode(np.zeros(6, np.uint32))


def test_tape_container_roundtrip_preserves_vars():
    """save_tape/load_tape (the VmData-serde analog,
    fidget-core/src/vm/data.rs:64): Var identities survive the
    round trip, so ShapeVars written against the original shape keep
    working on the decoded tape — and evaluation matches."""
    import numpy as np

    from fidget_tpu import Context, lower
    from fidget_tpu.compiler.bytecode import load_tape, save_tape
    from fidget_tpu.core.var import Var
    from fidget_tpu.eval.arith import FloatMode
    from fidget_tpu.eval.unrolled import eval_tape

    ctx = Context()
    v = Var.new()
    f = ctx.sub(
        ctx.sqrt(ctx.add(ctx.square(ctx.x()), ctx.square(ctx.y()))),
        ctx.input(v),
    )
    tape = lower(ctx, [f])
    t2 = load_tape(save_tape(tape))
    # identity, not just positional equivalence
    assert list(t2.var_map.items()) == list(tape.var_map.items())
    assert v in t2.var_map

    fm = FloatMode(np)
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(3, 64)).astype(np.float32)

    def ev(t):
        inputs = [None] * len(t.var_map)
        inputs[t.var_map[Var.X]] = pts[0]
        inputs[t.var_map[Var.Y]] = pts[1]
        inputs[t.var_map[v]] = pts[2]
        (out,), _ = eval_tape(t, fm, inputs)
        return out

    np.testing.assert_array_equal(ev(tape), ev(t2))


def test_tape_container_rejects_garbage():
    import pytest as _pytest

    from fidget_tpu.compiler.bytecode import load_tape

    with _pytest.raises(ValueError, match="magic"):
        load_tape(b"\x00" * 32)
    with _pytest.raises(ValueError, match="version"):
        import numpy as np

        load_tape(
            np.array([0x46545054, 99, 0, 0], "<u4").tobytes() + b"\x00" * 8
        )
