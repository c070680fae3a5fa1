"""Script engine tests: the Rhai-subset language and shape bindings
(behavior from fidget-rhai/src/lib.rs doctests and the bundled models)."""

import math

import numpy as np
import pytest

from fidget_tpu import Tree
from fidget_tpu.io.models import has_model, load_script
from fidget_tpu.script import ScriptError, engine, eval_script


def ev(src, x=0.0, y=0.0, z=0.0):
    return eval_script(src).tree.eval(x, y, z)


def test_axes_and_arithmetic():
    assert ev("let xyz = axes(); xyz.x + xyz.y", 1.0, 2.0) == 3.0
    assert ev("x + 2 * y", 1.0, 3.0) == 7.0
    assert ev("draw(x - 1);", 4.0) == 3.0


def test_constants_and_math():
    assert ev("x + cos(PI)", 0.0) == pytest.approx(-1.0)
    assert ev("let angle = PI / 4.0; x * cos(angle)", 2.0) == pytest.approx(
        math.sqrt(2)
    )


def test_integer_semantics():
    # rhai: int / int truncates; 1/3. is float
    assert ev("x + 1/3", 0.0) == pytest.approx(0.0)
    assert ev("x + 1/3.", 0.0) == pytest.approx(1 / 3)


def test_shape_map_form():
    v = ev("circle(#{ center: vec2(1.0, 2.0), radius: 3.0 })", 1.0, 2.0)
    assert v == pytest.approx(-3.0)
    # defaults may be omitted
    assert ev("circle(#{ center: [1, 2] })", 1.0, 2.0) == pytest.approx(-1.0)
    assert ev("sphere(#{ radius: 3 })", 0, 0, 0) == pytest.approx(-3.0)


def test_positional_and_coercions():
    # unique-typed positional, order doesn't matter
    assert ev("circle([1, 2], 3)", 1, 2) == pytest.approx(-3.0)
    assert ev("circle(3, [1, 2])", 1, 2) == pytest.approx(-3.0)
    assert ev("circle()", 0, 0) == pytest.approx(-1.0)
    # vec2 -> vec3 with default z
    assert ev("sphere([1, 1], 4)", 1, 1, 0) == pytest.approx(-4.0)


def test_transform_chaining():
    src = "circle(#{ center: [1, 2], radius: 3 }).move(#{ offset: [1, 1] })"
    assert ev(src, 2.0, 3.0) == pytest.approx(-3.0)
    src2 = "circle(#{ center: [1, 2], radius: 3 }).move([1, 1])"
    assert ev(src2, 2.0, 3.0) == pytest.approx(-3.0)


def test_csg_and_reduction():
    src = """
    let a = circle(#{ center: [0, 0], radius: 1 });
    let b = circle(#{ center: [1, 0], radius: 0.5 });
    difference(a, b)
    """
    assert ev(src, 1.0, 0.0) == pytest.approx(0.5)
    # union over arrays and varargs
    assert ev("union([circle(), circle(3, [5, 0])])", 5, 0) < 0
    assert ev("union(circle(), circle(3, [5, 0]))", 5, 0) < 0
    # automatic tree reduction: array of shapes into a transform
    v = ev("[circle(), circle(3, [5, 0])].move([1, 0])", 6, 0)
    assert v < 0


def test_fn_and_for_loop():
    src = """
    fn rings(n) {
        let out = circle(#{ radius: 0.1 });
        for i in 1..n {
            out = union(out, circle(#{ center: [i * 1.0, 0], radius: 0.1 }));
        }
        out
    }
    draw(rings(4));
    """
    t = eval_script(src).tree
    for cx in range(4):
        assert t.eval(float(cx), 0.0, 0.0) == pytest.approx(-0.1)
    assert t.eval(10.0, 0.0, 0.0) > 0


def test_if_else_and_comparison():
    src = """
    let r = 1.0;
    let big = if r > 0.5 { 2.0 } else { 0.5 };
    circle(#{ radius: big })
    """
    assert ev(src, 0, 0) == pytest.approx(-2.0)


def test_remap_and_modulo():
    assert ev("x.remap(y, x, z)", 1.0, 5.0) == 5.0
    # rem_euclid semantics on trees
    assert ev("(x % 2) - 1", -0.5) == pytest.approx(0.5)


def test_tree_comparison_rejected():
    with pytest.raises(ScriptError):
        eval_script("let a = x < 1.0; a")


def test_missing_map_property_raises():
    with pytest.raises(ScriptError):
        eval_script("let m = #{ a: 1.0 }; m.b")


def test_step_limit():
    with pytest.raises(ScriptError):
        eval_script("let i = 0; while true { i = i + 1; }")


@pytest.mark.parametrize(
    "name", ["gyroid-sphere.rhai", "sponge.rhai", "cabin.rhai"]
)
def test_bundled_models(name):
    if not has_model(name):
        pytest.skip("model assets unavailable")
    t = load_script(name)
    assert isinstance(t, Tree)
    # spot value checked by hand for gyroid; others: finite + sign change
    vals = [t.eval(x, 0.11, 0.23) for x in np.linspace(-1, 1, 9)]
    assert all(np.isfinite(vals))


def test_gyroid_value_matches_closed_form():
    if not has_model("gyroid-sphere.rhai"):
        pytest.skip("model assets unavailable")
    t = load_script("gyroid-sphere.rhai")
    x, y, z = 0.1, 0.2, 0.3
    xs, ys, zs = 30 * x, 30 * y, 30 * z
    g = (
        math.sin(xs) * math.cos(ys)
        + math.sin(ys) * math.cos(zs)
        + math.sin(zs) * math.cos(xs)
    )
    expect = max(
        math.sqrt(xs * xs + ys * ys + zs * zs) - 25, abs(g) - 0.2
    )
    assert t.eval(x, y, z) == pytest.approx(expect, rel=1e-5)


def test_modulo_by_zero():
    with pytest.raises(ScriptError):
        eval_script("let a = 5 % 0; a")
    assert math.isnan(eval_script("let a = 5.0 % 0.0; a").last)


def test_top_level_return_terminates_script():
    # Rhai allows top-level return: terminate with that value
    assert engine().eval("let a = 1; return a + 1; let b = 9;") == 2


def test_break_outside_loop_is_error():
    with pytest.raises(ScriptError, match="loop"):
        engine().run("break;")
    # break inside a called fn must NOT silently break the caller's loop
    with pytest.raises(ScriptError, match="loop"):
        engine().run(
            "fn f() { break; } let n = 0; for i in 0..10 { n += 1; f(); }"
        )


def test_map_property_assignment():
    assert engine().eval("let m = #{a: 1}; m.a = 2; m.a") == 2
    assert engine().eval("let m = #{a: 1}; m.a += 5; m.a") == 6


def test_float_literal_method_call():
    assert engine().eval("let v = (-1.5).abs(); v") == 1.5
    assert engine().eval("1.5.floor()") == 1.0
    # the range operator still lexes
    assert engine().eval("let s = 0; for i in 0..3 { s += i; } s") == 3


def test_transform_positional_type_dispatch():
    # rotate(shape, angle): float skips the axis field
    res = eval_script("draw(rotate(circle(#{radius: 0.5}), 45.0));")
    assert len(res.shapes) == 1


def test_scale_zero_component_is_ieee():
    # 1/0 = inf like the reference's Rust f64, not ZeroDivisionError
    res = eval_script("draw(scale(circle(#{radius: 0.5}), [0.0, 1.0, 1.0]));")
    assert len(res.shapes) == 1


# ---------------------------------------------------------------------
# round 3: closures + switch (fidget embeds full Rhai; these are the
# two most common idioms beyond the round-2 subset —
# fidget-rhai/src/lib.rs:74-225)


def test_closure_basics():
    assert engine().eval("let f = |x| x * 2; f(21)") == 42
    assert engine().eval("let f = |x| x * 2; f.call(21)") == 42
    assert engine().eval("let f = || 7; f()") == 7
    assert engine().eval("(|x, y| x + y)(2, 3)") == 5
    assert engine().eval("let f = |x| { let y = x + 1; y * 2 }; f(3)") == 8


def test_closure_capture_is_shared():
    # Rhai closures capture variables as shared references
    assert engine().eval(
        "let n = 0; let inc = || { n += 1; n }; inc(); inc(); n"
    ) == 2
    assert engine().eval(
        "fn make_adder(n) { |x| x + n } let g = make_adder(5); g(2)"
    ) == 7


def test_closure_builds_trees():
    res = eval_script(
        "let ball = |r| sphere(#{radius: r});\n"
        "draw(ball(0.5));"
    )
    assert len(res.shapes) == 1


def test_closure_arity_error():
    with pytest.raises(ScriptError, match="expects 1 args"):
        engine().eval("let f = |x| x; f(1, 2)")
    with pytest.raises(ScriptError, match="cannot call"):
        engine().eval("let a = [3]; a[0](1)")


def test_switch_literals_and_default():
    assert engine().eval("switch 2 { 1 => 10, 2 => 20, _ => 0 }") == 20
    assert engine().eval("switch 9 { 1 => 10, 2 => 20, _ => 0 }") == 0
    assert engine().eval('switch "b" { "a" => 1, "b" => 2, _ => 0 }') == 2
    # no match and no default -> unit (None)
    assert engine().eval("switch 9 { 1 => 10 }") is None


def test_switch_multi_and_range_patterns():
    assert engine().eval("switch 5 { 1 | 5 | 9 => 100, _ => 0 }") == 100
    assert engine().eval("switch 7 { 0..10 => 1, _ => 2 }") == 1
    assert engine().eval("switch 10 { 0..10 => 1, _ => 2 }") == 2
    assert engine().eval("switch 10 { 0..=10 => 1, _ => 2 }") == 1
    # Rhai switch matching is type-strict: int case doesn't match float
    assert engine().eval("switch 2.0 { 2 => 1, _ => 0 }") == 0


def test_switch_guards_and_blocks():
    assert engine().eval(
        "let x = 6; switch x { 6 if x > 5 => 1, 6 => 2, _ => 3 }"
    ) == 1
    assert engine().eval(
        "let x = 6; switch x { 6 if x > 9 => 1, 6 => 2, _ => 3 }"
    ) == 2
    assert engine().eval(
        "switch 1 { 1 => { let t = 4; t * 2 }, _ => 0 }"
    ) == 8


def test_array_closure_methods():
    assert engine().eval("[1,2,3].map(|v| v * v)") == [1, 4, 9]
    assert engine().eval("[1,2,3,4].filter(|v| v % 2 == 0)") == [2, 4]
    assert engine().eval("[1,2,3].reduce(|s, v| s + v, 0)") == 6
    assert engine().eval("[1,2,3].reduce(|s, v| s + v)") == 6
    assert engine().eval("let a = [1]; a.push(5); a.len()") == 2
    assert engine().eval("[].is_empty()") is True
    assert engine().eval("[1,2].contains(2)") is True
    assert engine().eval("#{a: 1, b: 2}.keys().len()") == 2


def test_user_fn_shadows_builtin():
    assert engine().eval("fn len(a) { 99 } [1,2,3].len()") == 99
