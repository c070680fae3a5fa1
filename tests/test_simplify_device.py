"""Device (batched) simplifier vs the host reference simplifier."""

import numpy as np
import jax.numpy as jnp

from fidget_tpu import Context, Var, lower, simplify
from fidget_tpu.compiler.pack import pack_rows, pack_tapes
from fidget_tpu.eval.arith import FloatMode, IntervalMode
from fidget_tpu.eval.pallas_interp import interp_float
from fidget_tpu.eval.simplify_device import DeviceSimplifier
from fidget_tpu.eval.unrolled import eval_tape


def _spiky(reg_limit=255):
    ctx = Context()
    x, y, z = ctx.x(), ctx.y(), ctx.z()
    r = ctx.sqrt(ctx.add(ctx.square(x), ctx.square(y)))
    circ = ctx.sub(r, 1.0)
    sq = ctx.max(ctx.sub(ctx.abs(x), 0.8), ctx.sub(ctx.abs(y), 0.8))
    swirl = ctx.add(ctx.sin(ctx.mul(x, 3.0)), ctx.cos(ctx.mul(y, 3.0)))
    f = ctx.min(circ, ctx.max(sq, ctx.mul(swirl, 0.2)))
    f = ctx.min(f, ctx.max(ctx.sub(z, 0.5), ctx.min(x, y)))
    return ctx, lower(ctx, [f], reg_limit=reg_limit)


def _random_choice_traces(tape, n, seed=0):
    """Real traces from interval evaluation over random regions."""
    rng = np.random.default_rng(seed)
    im = IntervalMode(np)
    traces = []
    regions = []
    for _ in range(n):
        c = rng.uniform(-1.5, 1.5, size=3)
        w = rng.uniform(0.05, 0.6, size=3)
        lo, hi = (c - w).astype(np.float32), (c + w).astype(np.float32)
        inputs = [None] * len(tape.var_map)
        for v, i in tape.var_map.items():
            k = {"x": 0, "y": 1, "z": 2}[v.kind]
            inputs[i] = (lo[k], hi[k])
        _, choices = eval_tape(tape, im, inputs, trace=True)
        traces.append(np.array([int(x) for x in choices], np.uint8))
        regions.append((lo, hi))
    return np.stack(traces), regions


def test_device_matches_host_simplify():
    for reg_limit in (255, 6):  # with and without spill slots
        ctx, tape = _spiky(reg_limit)
        ds = DeviceSimplifier(tape)
        traces, regions = _random_choice_traces(tape, 16, seed=reg_limit)
        w1, w2, imm, lengths, ncho = map(np.asarray, ds(jnp.asarray(traces)))
        fm = FloatMode(np)
        rng = np.random.default_rng(42)
        for t in range(len(traces)):
            host = simplify(tape, traces[t])
            # Same instruction count as the host simplifier. The host
            # keeps separate LOAD/STORE rows which the packed form also
            # keeps (as copies), so lengths must agree exactly.
            assert lengths[t] == len(host), (reg_limit, t, lengths[t], len(host))
            assert ncho[t] == host.choice_count
            # the packed child rows are bit-identical to packing the
            # host-simplified tape
            hw1, hw2, himm = pack_rows(host)
            np.testing.assert_array_equal(w1[t, : lengths[t]], hw1)
            np.testing.assert_array_equal(w2[t, : lengths[t]], hw2)
            np.testing.assert_array_equal(imm[t, : lengths[t]], himm)
            # Values agree inside the region via the packed child tape
            lo, hi = regions[t]
            pts = np.stack(
                [rng.uniform(lo[k], hi[k], 256).astype(np.float32) for k in range(3)]
            )
            V = len(tape.var_map)
            vars_ = np.zeros((1, V, 2, 128), np.float32)
            for v, i in tape.var_map.items():
                k = {"x": 0, "y": 1, "z": 2}[v.kind]
                vars_[0, i] = pts[k].reshape(2, 128)
            got = interp_float(
                w1[t : t + 1], w2[t : t + 1], imm[t : t + 1], lengths[t : t + 1],
                vars_, nf=ds.nf, n_inputs=V, n_outputs=1, s0=2, interpret=True,
            )
            # child tape must match the parent tape bit-exactly through
            # the same kernel (sin/cos ulp differences cancel out)
            pw = pack_tapes([tape])
            parent = interp_float(
                pw.w1, pw.w2, pw.imm, pw.lengths, vars_,
                nf=ds.nf, n_inputs=V, n_outputs=1, s0=2, interpret=True,
            )
            np.testing.assert_array_equal(np.asarray(got), np.asarray(parent))
            # and loosely match the numpy host evaluator
            inputs = [None] * V
            for v, i in tape.var_map.items():
                inputs[i] = pts[{"x": 0, "y": 1, "z": 2}[v.kind]]
            (want,), _ = eval_tape(tape, fm, inputs)
            np.testing.assert_allclose(
                np.asarray(got)[0, 0].reshape(-1), want, rtol=1e-6, atol=1e-7
            )


def test_device_simplify_all_both_is_identity():
    ctx, tape = _spiky()
    ds = DeviceSimplifier(tape)
    traces = np.full((2, tape.choice_count), 3, np.uint8)  # all Both
    w1, w2, imm, lengths, ncho = map(np.asarray, ds(jnp.asarray(traces)))
    assert lengths[0] == len(tape)
    assert ncho[0] == tape.choice_count
