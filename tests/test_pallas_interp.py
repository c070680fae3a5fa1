"""Pallas tape-interpreter kernels vs host numpy evaluators.

Runs in interpret mode on the CPU mesh; the same kernels compile for
real TPU (exercised by bench.py / the driver).
"""

import numpy as np
import pytest

from fidget_tpu import Context, Var, lower
from fidget_tpu.compiler.pack import pack_tapes
from fidget_tpu.compiler.simplify import simplify
from fidget_tpu.eval.arith import FloatMode, GradMode, IntervalMode
from fidget_tpu.eval.pallas_interp import (
    interp_float,
    interp_grad,
    interp_interval,
    unpack_choices,
)
from fidget_tpu.eval.unrolled import eval_tape

S0 = 8
LANES = S0 * 128


def _build_shapes():
    """A few distinct tapes to fill an arena."""
    tapes = []
    ctx = Context()
    x, y, z = ctx.x(), ctx.y(), ctx.z()
    circle = ctx.sub(ctx.sqrt(ctx.add(ctx.square(x), ctx.square(y))), 0.8)
    tapes.append(lower(ctx, [circle]))

    ctx2 = Context()
    x, y, z = ctx2.x(), ctx2.y(), ctx2.z()
    box = ctx2.max(ctx2.sub(ctx2.abs(x), 0.5), ctx2.sub(ctx2.abs(y), 0.25))
    wavy = ctx2.add(box, ctx2.mul(ctx2.sin(ctx2.mul(y, 5.0)), 0.1))
    tapes.append(lower(ctx2, [wavy]))

    ctx3 = Context()
    x, y, z = ctx3.x(), ctx3.y(), ctx3.z()
    gy = ctx3.add(
        ctx3.mul(ctx3.sin(x), ctx3.cos(y)),
        ctx3.add(
            ctx3.mul(ctx3.sin(y), ctx3.cos(z)), ctx3.mul(ctx3.sin(z), ctx3.cos(x))
        ),
    )
    sphere = ctx3.sub(
        ctx3.sqrt(ctx3.add(ctx3.square(x), ctx3.add(ctx3.square(y), ctx3.square(z)))),
        0.9,
    )
    tapes.append(lower(ctx3, [ctx3.max(sphere, gy)]))
    return tapes


def _var_planes(tape, pts, planes=1):
    """pts: [3, LANES] -> [V, S0, 128] (float) input array."""
    V = len(tape.var_map)
    kind_to_row = {"x": 0, "y": 1, "z": 2}
    out = np.zeros((V, S0, 128), np.float32)
    for v, i in tape.var_map.items():
        out[i] = pts[kind_to_row[v.kind]].reshape(S0, 128)
    return out


def test_float_kernel_matches_host():
    tapes = _build_shapes()
    packed = pack_tapes(tapes, capacity=64)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-2, 2, size=(len(tapes), 3, LANES)).astype(np.float32)
    V = max(len(t.var_map) for t in tapes)
    vars_ = np.zeros((len(tapes), V, S0, 128), np.float32)
    for t_i, tape in enumerate(tapes):
        vp = _var_planes(tape, pts[t_i])
        vars_[t_i, : vp.shape[0]] = vp
    out = interp_float(
        packed.w1, packed.w2, packed.imm, packed.lengths, vars_,
        nf=packed.nf, n_inputs=V, n_outputs=1, s0=S0, interpret=True,
    )
    out = np.asarray(out)
    fm = FloatMode(np)
    for t_i, tape in enumerate(tapes):
        inputs = [None] * len(tape.var_map)
        for v, i in tape.var_map.items():
            inputs[i] = pts[t_i, {"x": 0, "y": 1, "z": 2}[v.kind]]
        (want,), _ = eval_tape(tape, fm, inputs)
        got = out[t_i, 0].reshape(-1)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_float_kernel_with_spills():
    """Tiny register file forces LOAD/STORE -> unified-file copies."""
    ctx = Context()
    x, y = ctx.x(), ctx.y()
    f = ctx.min(
        ctx.add(ctx.sin(ctx.mul(x, 3.0)), ctx.cos(ctx.mul(y, 2.0))),
        ctx.sub(ctx.sqrt(ctx.add(ctx.square(x), ctx.square(y))), 1.0),
    )
    tape = lower(ctx, [f], reg_limit=3)
    assert tape.mem_count > 0
    packed = pack_tapes([tape])
    rng = np.random.default_rng(1)
    pts = rng.uniform(-2, 2, size=(3, LANES)).astype(np.float32)
    vars_ = _var_planes(tape, pts)[None]
    out = interp_float(
        packed.w1, packed.w2, packed.imm, packed.lengths, vars_,
        nf=packed.nf, n_inputs=vars_.shape[1], n_outputs=1, s0=S0,
        interpret=True,
    )
    inputs = [None] * len(tape.var_map)
    for v, i in tape.var_map.items():
        inputs[i] = pts[{"x": 0, "y": 1, "z": 2}[v.kind]]
    (want,), _ = eval_tape(tape, FloatMode(np), inputs)
    np.testing.assert_allclose(
        np.asarray(out)[0, 0].reshape(-1), want, rtol=1e-6, atol=1e-7
    )


def test_interval_kernel_matches_host():
    tapes = _build_shapes()
    packed = pack_tapes(tapes, capacity=64)
    rng = np.random.default_rng(2)
    V = max(len(t.var_map) for t in tapes)
    lo = rng.uniform(-2, 2, size=(len(tapes), V, S0, 128)).astype(np.float32)
    hi = (lo + rng.uniform(0, 1, size=lo.shape)).astype(np.float32)
    cw = 2
    olo, ohi, chp = interp_interval(
        packed.w1, packed.w2, packed.imm, packed.lengths, lo, hi,
        nf=packed.nf, n_inputs=V, n_outputs=1, s0=S0, c_words=cw,
        interpret=True,
    )
    im = IntervalMode(np)
    for t_i, tape in enumerate(tapes):
        inputs = [None] * len(tape.var_map)
        for v, i in tape.var_map.items():
            inputs[i] = (lo[t_i, i].reshape(-1), hi[t_i, i].reshape(-1))
        (want,), choices = eval_tape(tape, im, inputs, trace=True)
        np.testing.assert_allclose(
            np.asarray(olo)[t_i, 0].reshape(-1), want[0], rtol=1e-6, atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(ohi)[t_i, 0].reshape(-1), want[1], rtol=1e-6, atol=1e-7
        )
        if tape.choice_count:
            got_ch = unpack_choices(np.asarray(chp)[t_i], tape.choice_count)
            want_ch = np.stack([c.reshape(S0, 128) for c in choices])
            np.testing.assert_array_equal(got_ch, want_ch)


def test_interval_choices_drive_simplify():
    """End-to-end: kernel choices -> host simplify -> values preserved."""
    tapes = _build_shapes()
    tape = tapes[2]
    packed = pack_tapes([tape])
    lo = np.zeros((1, 3, S0, 128), np.float32)
    hi = np.zeros((1, 3, S0, 128), np.float32)
    # each lane is a region; use lane 0 = a region where sphere dominates
    lo[0, :, 0, 0] = [2.0, 2.0, 2.0]
    hi[0, :, 0, 0] = [2.5, 2.5, 2.5]
    olo, ohi, chp = interp_interval(
        packed.w1, packed.w2, packed.imm, packed.lengths, lo, hi,
        nf=packed.nf, n_inputs=3, n_outputs=1, s0=S0, c_words=1,
        interpret=True,
    )
    ch = unpack_choices(np.asarray(chp)[0], tape.choice_count)[:, 0, 0]
    stape = simplify(tape, ch)
    assert len(stape) < len(tape)
    rng = np.random.default_rng(3)
    pts = rng.uniform(2.0, 2.5, size=(3, 64)).astype(np.float32)
    fm = FloatMode(np)
    for t in (tape, stape):
        inputs = [None] * len(t.var_map)
        for v, i in t.var_map.items():
            inputs[i] = pts[{"x": 0, "y": 1, "z": 2}[v.kind]]
        (out,), _ = eval_tape(t, fm, inputs)
        if t is tape:
            want = out
        else:
            np.testing.assert_array_equal(out, want)


def test_grad_kernel_matches_host():
    tapes = _build_shapes()
    packed = pack_tapes(tapes, capacity=64)
    rng = np.random.default_rng(4)
    V = 3
    vals = rng.uniform(-2, 2, size=(len(tapes), V, S0, 128)).astype(np.float32)
    vars_ = np.zeros((len(tapes), V, 4, S0, 128), np.float32)
    for t_i, tape in enumerate(tapes):
        for v, i in tape.var_map.items():
            k = {"x": 0, "y": 1, "z": 2}[v.kind]
            vars_[t_i, i, 0] = vals[t_i, k]
            vars_[t_i, i, 1 + k] = 1.0  # dx/dy/dz identity duals
    out = interp_grad(
        packed.w1, packed.w2, packed.imm, packed.lengths, vars_,
        nf=packed.nf, n_inputs=V, n_outputs=1, s0=S0, interpret=True,
    )
    gm = GradMode(np)
    for t_i, tape in enumerate(tapes):
        inputs = [None] * len(tape.var_map)
        for v, i in tape.var_map.items():
            k = {"x": 0, "y": 1, "z": 2}[v.kind]
            one = np.float32(1.0)
            zero = np.zeros(LANES, np.float32)
            d = [zero, zero, zero]
            d[k] = np.ones(LANES, np.float32)
            inputs[i] = (vals[t_i, k].reshape(-1), d[0], d[1], d[2])
        (want,), _ = eval_tape(tape, gm, inputs)
        for k in range(4):
            np.testing.assert_allclose(
                np.asarray(out)[t_i, 0, k].reshape(-1),
                want[k],
                rtol=1e-5,
                atol=1e-6,
            )


def test_tape_n_ops_covers_simplified_children():
    """Simplification rewrites min/max/and/or into COPY; the dispatch
    vocabulary must therefore always cover OUTPUT/INPUT/COPY even
    when the parent tape has none (a frequency renumbering would
    otherwise sort an unused COPY past the truncation point and
    lax.switch would silently clamp it onto the wrong branch — only
    visible on hardware, where interpret mode never runs)."""
    from fidget_tpu import Context, lower
    from fidget_tpu.compiler.pack import frequency_op_order
    from fidget_tpu.compiler.tape import TapeOp
    from fidget_tpu.eval.pallas_interp import tape_n_ops
    from fidget_tpu.io.models import has_model, load_vm_tape

    tapes = []
    ctx = Context()
    tapes.append(lower(ctx, [ctx.min(ctx.x(), ctx.y())]))  # no COPY
    if has_model("colonnade.vm"):
        tapes.append(load_vm_tape("colonnade.vm"))
    for tape in tapes:
        for order in (None, frequency_op_order(tape)):
            n_ops = tape_n_ops(tape, order)
            oo = order or tuple(range(31))
            pos_of = {int(c): p for p, c in enumerate(oo)}
            for op in (TapeOp.OUTPUT, TapeOp.INPUT, TapeOp.COPY):
                assert pos_of[int(op)] < n_ops, (op, n_ops)


def test_interp_grad_s0_chunking():
    """Large nf*s0 transparently splits the lane axis into VMEM-sized
    chunks (the dual kernel holds four register files in scratch; the
    unchunked form OOMs Mosaic's scoped-vmem limit on hardware,
    BUGREPORT.md r5 #1). Chunked output must equal per-slice calls."""
    import jax.numpy as jnp

    from fidget_tpu.compiler.pack import pack_tapes
    from fidget_tpu.eval.pallas_interp import interp_grad
    from fidget_tpu.io.models import has_model, load_vm_tape

    if not has_model("prospero.vm"):
        pytest.skip("model assets unavailable")
    tape = load_vm_tape("prospero.vm")
    packed = pack_tapes([tape])
    nf = packed.nf
    s0 = 128  # the 128-px leaf's lane block: nf*s0 far past budget
    assert nf * s0 > (12 << 20) // (4 * 4 * 128)
    rng = np.random.default_rng(0)
    V = max(1, len(tape.var_map))
    duals = rng.normal(size=(1, V, 4, s0, 128)).astype(np.float32)
    full = np.asarray(interp_grad(
        packed.w1, packed.w2, packed.imm, packed.lengths,
        jnp.asarray(duals), nf=nf, n_inputs=V, n_outputs=1, s0=s0,
        interpret=True,
    ))
    half = s0 // 2
    parts = [
        np.asarray(interp_grad(
            packed.w1, packed.w2, packed.imm, packed.lengths,
            jnp.asarray(duals[..., o:o + half, :]),
            nf=nf, n_inputs=V, n_outputs=1, s0=half, interpret=True,
        ))
        for o in (0, half)
    ]
    np.testing.assert_array_equal(full, np.concatenate(parts, axis=3))


def test_interp_interval_s0_chunking():
    """The interval kernel (two register files + choice planes)
    chunks the lane axis past the VMEM budget exactly like the dual
    kernel; outputs AND packed choices must equal per-slice calls."""
    import jax.numpy as jnp

    from fidget_tpu.compiler.pack import pack_tapes
    from fidget_tpu.eval.pallas_interp import interp_interval
    from fidget_tpu.io.models import has_model, load_vm_tape

    if not has_model("prospero.vm"):
        pytest.skip("model assets unavailable")
    tape = load_vm_tape("prospero.vm")
    packed = pack_tapes([tape])
    nf = packed.nf
    s0 = 128
    assert nf * s0 > (12 << 20) // (2 * 4 * 128)
    cw = max(1, -(-tape.choice_count // 16))
    rng = np.random.default_rng(1)
    V = max(1, len(tape.var_map))
    lo = rng.uniform(-1, 1, (1, V, s0, 128)).astype(np.float32)
    hi = lo + rng.uniform(0, 0.5, lo.shape).astype(np.float32)
    kw = dict(nf=nf, n_inputs=V, n_outputs=1, c_words=cw, interpret=True)
    flo, fhi, fch = interp_interval(
        packed.w1, packed.w2, packed.imm, packed.lengths,
        jnp.asarray(lo), jnp.asarray(hi), s0=s0, **kw,
    )
    half = s0 // 2
    plo, phi, pch = [], [], []
    for o in (0, half):
        a, b, c = interp_interval(
            packed.w1, packed.w2, packed.imm, packed.lengths,
            jnp.asarray(lo[..., o:o + half, :]),
            jnp.asarray(hi[..., o:o + half, :]), s0=half, **kw,
        )
        plo.append(np.asarray(a))
        phi.append(np.asarray(b))
        pch.append(np.asarray(c))
    np.testing.assert_array_equal(
        np.asarray(flo), np.concatenate(plo, axis=2))
    np.testing.assert_array_equal(
        np.asarray(fhi), np.concatenate(phi, axis=2))
    np.testing.assert_array_equal(
        np.asarray(fch), np.concatenate(pch, axis=2))
