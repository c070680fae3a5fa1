"""Native (C++) tape compiler tests: equivalence with the Python path."""

import numpy as np
import pytest

from fidget_tpu import Context, lower
from fidget_tpu.eval.arith import FloatMode
from fidget_tpu.eval.unrolled import eval_tape
from fidget_tpu.io.models import has_model, find_model
from fidget_tpu.native import available, compile_vm

pytestmark = pytest.mark.skipif(
    not available(), reason="no native toolchain"
)


def _eval(tape, pts):
    inputs = [None] * len(tape.var_map)
    axes = {"x": pts[0], "y": pts[1], "z": pts[2]}
    for v, i in tape.var_map.items():
        inputs[i] = axes[v.kind]
    with np.errstate(all="ignore"):
        (d,), _ = eval_tape(tape, FloatMode(np), inputs)
    return d


@pytest.mark.parametrize(
    "name",
    ["hi.vm", "quarter.vm", "tanglecube.vm", "bear.vm", "colonnade.vm"],
)
def test_matches_python_on_models(name):
    if not has_model(name):
        pytest.skip("model assets unavailable")
    src = find_model(name).read_text()
    nt = compile_vm(src)
    ctx, root = Context.from_text(src)
    pt = lower(ctx, [root])
    # input *sets* must match; order may differ (bindings are by Var
    # identity everywhere, so order is not semantic)
    assert set(nt.var_map) == set(pt.var_map)
    rng = np.random.RandomState(0)
    pts = rng.uniform(-1.5, 1.5, size=(3, 4096)).astype(np.float32)
    np.testing.assert_allclose(
        _eval(nt, pts), _eval(pt, pts), rtol=1e-5, atol=1e-6
    )


def test_all_opcodes():
    src = """
a var-x
b var-y
c var-z
n0 neg a
n1 abs b
n2 recip c
n3 sqrt n1
n4 square a
n5 floor b
n6 ceil c
n7 round a
n8 sin b
n9 cos c
n10 tan a
n11 asin b
n12 acos c
n13 atan a
n14 exp b
n15 ln n1
n16 not a
k0 const 0.5
s0 add n0 n1
s1 sub s0 n2
s2 mul s1 n3
s3 div s2 n4
s4 atan2 s3 n5
s5 min s4 n6
s6 max s5 n7
s7 compare s6 n8
s8 mod s7 n9
s9 and s8 n10
s10 or s9 n11
s11 add s10 n12
s12 add s11 n13
s13 add s12 n14
s14 add s13 n15
s15 add s14 n16
s16 mul s15 k0
"""
    nt = compile_vm(src)
    ctx, root = Context.from_text(src)
    pt = lower(ctx, [root])
    rng = np.random.RandomState(1)
    pts = rng.uniform(0.1, 0.9, size=(3, 512)).astype(np.float32)
    np.testing.assert_allclose(
        _eval(nt, pts), _eval(pt, pts), rtol=2e-5, atol=1e-5, equal_nan=True
    )


def test_spill_paths():
    # deep chain of live values forces spills at a tiny register limit
    lines = ["x var-x", "y var-y"]
    names = []
    for i in range(40):
        lines.append(f"m{i} mul x y")
        lines.append(f"x2_{i} add x m{i}")
        names.append(f"x2_{i}")
    acc = names[0]
    for i, n in enumerate(names[1:]):
        lines.append(f"acc{i} add {acc} {n}")
        acc = f"acc{i}"
    src = "\n".join(lines)
    nt = compile_vm(src, reg_limit=4)
    assert nt.mem_count > 0  # actually spilled
    ctx, root = Context.from_text(src)
    pt = lower(ctx, [root])
    rng = np.random.RandomState(2)
    pts = rng.uniform(-1, 1, size=(3, 256)).astype(np.float32)
    np.testing.assert_allclose(
        _eval(nt, pts), _eval(pt, pts), rtol=1e-5, atol=1e-6
    )


def test_errors():
    with pytest.raises(ValueError):
        compile_vm("a bogus x")
    with pytest.raises(ValueError):
        compile_vm("a add undefined1 undefined2")
    with pytest.raises(ValueError):
        compile_vm("")


def test_unused_axis_excluded_from_varmap():
    src = "a var-x\nb var-z\nc add a a\n"
    # var-z defined but... used? b unused entirely
    nt = compile_vm(src)
    kinds = [v.kind for v in nt.var_map]
    assert kinds == ["x"]


def test_unary_and_binary_on_constants_fold():
    # regression: unary on a const used to emit a LOAD from slot -1
    t = compile_vm("a const 1.5\nb neg a\nx var-x\nc add x b\n")
    pts = np.array([[2.0], [0.0], [0.0]], np.float32)
    np.testing.assert_allclose(_eval(t, pts), [0.5])
    t2 = compile_vm("a const 2\nb const 3\nc min a b\nx var-x\nd mul x c\n")
    np.testing.assert_allclose(_eval(t2, pts), [4.0])
    t3 = compile_vm("a const 4\nb sqrt a\nx var-x\nc add x b\n")
    np.testing.assert_allclose(_eval(t3, pts), [4.0])


def test_dead_subtree_not_emitted():
    """Nodes reachable only through dead consumers must be pruned (the
    reference's .vm dumps can contain unreachable definitions); they
    used to be emitted forever AND pin their operands' registers."""
    if not available():
        pytest.skip("no native toolchain")
    text = (
        "x var-x\n"
        "t1 sin x\n"
        "t2 mul t1 t1\n"  # dead: nothing references t2
        "out add x x\n"
    )
    t = compile_vm(text)
    from fidget_tpu.compiler.tape import TapeOp

    ops = [TapeOp(int(o)) for o in t.op]
    assert TapeOp.SIN not in ops and TapeOp.MUL not in ops


def test_native_reg_limit_contract():
    if not available():
        pytest.skip("no native toolchain")
    with pytest.raises(Exception, match="reg_limit"):
        compile_vm("x var-x\no neg x\n", reg_limit=1)


def test_native_round_fold_large_integer():
    if not available():
        pytest.skip("no native toolchain")
    # const-folded ROUND must match FloatMode's 2^23 guard
    text = "a const 8388609\nb round a\nc var-x\nout add b c\n"
    t = compile_vm(text)
    (d,), _ = eval_tape(
        t, FloatMode(np), [np.zeros(1, np.float32)]
    )
    assert float(d[0]) == 8388609.0
