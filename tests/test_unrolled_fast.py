"""Certification of the fast unrolled evaluators (eval/unrolled_fast).

`eval_tape_interval_fast` is the tiled-unrolled pipeline's cull stage:
its proofs must be (a) bit-identical to the `IntervalMode` oracle on
NaN-free paths and (b) SOUND everywhere — a proven-inside/outside box
must contain no counterexample point. The float twin is certified
against the host oracle by the render2d unrolled tests; here we fuzz
the interval twin directly over random tapes and boxes.
"""

import numpy as np
import pytest

from fidget_tpu.eval.arith import IntervalMode
from fidget_tpu.eval.unrolled import eval_tape
from fidget_tpu.eval.unrolled_fast import eval_tape_interval_fast

from test_fuzz import random_tape


def _boxes(rng, n, dims):
    lo = rng.uniform(-1.2, 1.0, size=(3, n)).astype(np.float32)
    width = rng.uniform(0.0, 0.5, size=(3, n)).astype(np.float32)
    hi = (lo + width).astype(np.float32)
    if dims == 2:
        lo[2] = hi[2] = 0.0
    return lo, hi


@pytest.mark.parametrize("seed", range(4))
def test_interval_fast_matches_oracle_and_is_sound(seed):
    dims = 2 if seed % 2 else 3
    tape = random_tape(seed, dims=dims)
    V = max(1, len(tape.var_map))
    axis_of = {v.kind: i for v, i in tape.var_map.items()}
    rng = np.random.RandomState(1000 + seed)
    n = 512
    lo, hi = _boxes(rng, n, dims)

    inputs = [(np.zeros(n, np.float32), np.zeros(n, np.float32))] * V
    inputs = list(inputs)
    for k, row in (("x", 0), ("y", 1), ("z", 2)):
        if axis_of.get(k) is not None:
            inputs[axis_of[k]] = (lo[row], hi[row])

    with np.errstate(all="ignore"):
        (oro,), _ = eval_tape(tape, IntervalMode(np), inputs)
    olo, ohi = oro

    jlo, jhi = eval_tape_interval_fast(
        tape, [(np.asarray(a), np.asarray(b)) for a, b in inputs]
    )
    flo, fhi = np.asarray(jlo[0]), np.asarray(jhi[0])

    # (a) clean-path equality: where neither evaluator produced NaN
    clean = (
        ~np.isnan(flo) & ~np.isnan(fhi) & ~np.isnan(olo) & ~np.isnan(ohi)
    )
    # (XLA may contract mul+add chains differently from the NumPy
    # oracle — tiny ULP-level drift is expected, proof-identical)
    np.testing.assert_allclose(flo[clean], olo[clean], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(fhi[clean], ohi[clean], rtol=1e-5, atol=1e-6)

    # (b) soundness of the proofs actually used by the cull
    # (hi < 0 -> inside everywhere; lo > 0 -> outside everywhere):
    # sampled points inside each box must respect them
    m = 32
    t = rng.uniform(0.0, 1.0, size=(m, 3, n)).astype(np.float32)
    px = lo[None, :, :] + t * (hi - lo)[None, :, :]  # [m, 3, n]
    from fidget_tpu.eval.arith import FloatMode

    fm = FloatMode(np)
    vals = np.empty((m, n), np.float32)
    for j in range(m):
        pin = [np.zeros(n, np.float32)] * V
        for k, row in (("x", 0), ("y", 1), ("z", 2)):
            if axis_of.get(k) is not None:
                pin[axis_of[k]] = px[j, row]
        with np.errstate(all="ignore"):
            (pv,), _ = eval_tape(tape, fm, pin)
        vals[j] = pv
    proven_in = fhi < 0.0
    proven_out = flo > 0.0
    assert not (proven_in & proven_out).any()
    # NaN sample values void a proof only if the oracle also missed
    # them; the oracle is the certified baseline, so require samples
    # to be contained outright
    assert (vals[:, proven_in] < 0.0).all()
    assert (vals[:, proven_out] > 0.0).all()


def test_interval_fast_nan_inputs_stay_active():
    # a NaN input box must not produce a fill proof
    tape = random_tape(7, dims=2)
    V = max(1, len(tape.var_map))
    axis_of = {v.kind: i for v, i in tape.var_map.items()}
    n = 8
    nanv = np.full(n, np.nan, np.float32)
    inputs = [(nanv, nanv)] * V
    jlo, jhi = eval_tape_interval_fast(tape, list(inputs))
    flo, fhi = np.asarray(jlo[0]), np.asarray(jhi[0])
    assert not (fhi < 0.0).any()
    assert not (flo > 0.0).any()


def test_interval_fast_div_by_immediate_stays_finite():
    """Regression: `x / const` once poisoned EVERY interval to NaN
    because the zero-span test `~(py bool)` evaluated to the truthy
    integer -2 when the denominator was an immediate — silently
    disabling unrolled interval culling for any tape with division by
    a constant (bear.vm has 40 of them)."""
    from fidget_tpu import Context, lower

    ctx = Context()
    x, y = ctx.x(), ctx.y()
    # circle of radius 0.5, expressed through div-by-imm
    d = ctx.sub(
        ctx.sqrt(ctx.add(ctx.square(x), ctx.square(y))), ctx.div(1.0, 2.0)
    )
    d = ctx.div(d, 2.0)  # scale by a constant denominator
    tape = lower(ctx, [d])
    axis_of = {v.kind: i for v, i in tape.var_map.items()}
    V = max(1, len(tape.var_map))
    inputs = [(np.zeros(1, np.float32), np.zeros(1, np.float32))] * V
    inputs = list(inputs)
    # box far outside the circle: must PROVE empty (lo > 0), not NaN
    inputs[axis_of["x"]] = (
        np.array([0.9], np.float32), np.array([1.0], np.float32)
    )
    inputs[axis_of["y"]] = (
        np.array([0.9], np.float32), np.array([1.0], np.float32)
    )
    los, his = eval_tape_interval_fast(tape, inputs)
    lo, hi = float(np.asarray(los[0])[0]), float(np.asarray(his[0])[0])
    assert np.isfinite(lo) and np.isfinite(hi), (lo, hi)
    assert lo > 0.0  # interval proof fires
    # negative constant denominator: bounds swap but stay finite
    ctx2 = Context()
    d2 = ctx2.div(ctx2.x(), -2.0)
    t2 = lower(ctx2, [d2])
    l2, h2 = eval_tape_interval_fast(
        t2, [(np.array([1.0], np.float32), np.array([2.0], np.float32))]
    )
    assert float(np.asarray(l2[0])[0]) == -1.0
    assert float(np.asarray(h2[0])[0]) == -0.5
    # denominator interval spanning zero still poisons (soundness)
    ctx3 = Context()
    d3 = ctx3.div(1.0, ctx3.x())
    t3 = lower(ctx3, [d3])
    l3, h3 = eval_tape_interval_fast(
        t3, [(np.array([-1.0], np.float32), np.array([1.0], np.float32))]
    )
    assert np.isnan(float(np.asarray(l3[0])[0]))
