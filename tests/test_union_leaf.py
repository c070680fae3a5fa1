"""Union-tape unrolled leaf (render2d leaf="union").

The per-frame validity routing must make results exact for ANY camera
— tiles whose captured choice trace escapes their block union run the
full tape on the fallback worklist (compiler/unions.py). Mirrors the
reference's guarantee that the JIT leaf only ever executes tapes that
are valid simplifications for the enclosing region
(fidget-raster/src/pixel.rs:370-391)."""

import numpy as np
import pytest

from fidget_tpu.compiler.unions import build_union_plan, pack_choices
from fidget_tpu.io.models import load_vm_tape
from fidget_tpu.render.region import ImageSize
from fidget_tpu.render.render2d import PixelRenderer


def _check_exact(img, brute):
    assert (img.inside() == (brute < 0)).all()
    ev = img.fill == 0
    ok = np.isclose(img.distance[ev], brute[ev], rtol=1e-5, atol=1e-5)
    ok |= np.isnan(img.distance[ev]) & np.isnan(brute[ev])
    assert ok.all()


@pytest.mark.parametrize(
    "model,N,bpx", [("hi.vm", 128, 32), ("quarter.vm", 256, 64)]
)
def test_union_leaf_matches_brute(model, N, bpx):
    tape = load_vm_tape(model)
    r = PixelRenderer(tape, ImageSize(N, N))
    img = r.render_unrolled(tile_size=8, leaf="union", block_px=bpx)
    _check_exact(img, r.render_brute())
    assert r.union_stats["n_fallback"] == 0  # plan camera: all valid
    assert r.union_stats["programs"] >= 1


def test_union_leaf_stale_camera_exact_via_fallback():
    """A camera the plan was NOT built for must still render exactly:
    invalidated tiles take the full-tape fallback worklist."""
    tape = load_vm_tape("hi.vm")
    r = PixelRenderer(tape, ImageSize(128, 128))
    r.render_unrolled(tile_size=8, leaf="union", block_px=32)
    m = np.array(
        [[0.7, 0.1, 0.2], [-0.1, 0.7, -0.1], [0, 0, 1]], np.float32
    )
    img = r.render_unrolled(m, tile_size=8, leaf="union", block_px=32)
    _check_exact(img, r.render_brute(m))
    assert r.union_stats["n_fallback"] > 0  # proves the route was used


def test_union_leaf_matches_full_leaf():
    tape = load_vm_tape("quarter.vm")
    r = PixelRenderer(tape, ImageSize(128, 128))
    iu = r.render_unrolled(tile_size=8, leaf="union", block_px=32)
    if_ = r.render_unrolled(tile_size=8, leaf="full")
    assert (iu.fill == if_.fill).all()
    ev = iu.fill == 0
    assert np.allclose(
        iu.distance[ev], if_.distance[ev], rtol=1e-6, atol=1e-6,
        equal_nan=True,
    )


def test_device_capture_matches_host_pack():
    """eval_tape_interval_fast(capture=True)'s packed words must equal
    the host pack_choices layout over the oracle's choice codes on
    NaN-free inputs."""
    import jax.numpy as jnp

    from fidget_tpu.eval.arith import IntervalMode
    from fidget_tpu.eval.unrolled import eval_tape
    from fidget_tpu.eval.unrolled_fast import eval_tape_interval_fast

    tape = load_vm_tape("hi.vm")
    rng = np.random.default_rng(0)
    T = 64
    lo = rng.uniform(-2, 2, (3, T)).astype(np.float32)
    hi = lo + rng.uniform(0, 1, (3, T)).astype(np.float32)
    axis_of = {v.kind: i for v, i in tape.var_map.items()}
    V = max(1, len(tape.var_map))
    host_in = [(np.zeros(T, np.float32), np.zeros(T, np.float32))] * V
    dev_in = [(jnp.zeros(T), jnp.zeros(T))] * V
    for k, kind in enumerate(("x", "y", "z")):
        i = axis_of.get(kind)
        if i is not None:
            host_in[i] = (lo[k], hi[k])
            dev_in[i] = (jnp.asarray(lo[k]), jnp.asarray(hi[k]))
    with np.errstate(all="ignore"):
        outs, choices = eval_tape(tape, IntervalMode(np), host_in, trace=True)
    want = pack_choices(np.stack(choices))
    los, his, words = eval_tape_interval_fast(tape, dev_in, capture=True)
    got = np.stack([np.asarray(w) for w in words], axis=1)
    assert got.shape == want.shape
    assert (got == want).all()
    np.testing.assert_allclose(np.asarray(los[0]), outs[0][0], rtol=1e-6)


def test_plan_capacity_overflow_rebuilds():
    """Zooming out massively (far more active tiles than plan caps)
    must trigger the overflow rebuild and still render exactly."""
    tape = load_vm_tape("hi.vm")
    r = PixelRenderer(tape, ImageSize(128, 128))
    # plan at a zoomed-IN camera: few active tiles, tight caps
    m_in = np.diag([0.2, 0.2, 1.0]).astype(np.float32)
    r.render_unrolled(m_in, tile_size=8, leaf="union", block_px=32)
    img = r.render_unrolled(tile_size=8, leaf="union", block_px=32)
    _check_exact(img, r.render_brute())


def test_union_plan_auto_refresh():
    """Camera drift pushing >5% of active tiles to the fallback must
    trigger a background plan rebuild at the new camera; once swapped,
    the same view renders with zero fallback (the reference's
    re-simplify-on-trace-change, render/mod.rs:122-129)."""
    import time

    tape = load_vm_tape("hi.vm")
    r = PixelRenderer(tape, ImageSize(128, 128))
    r.render_unrolled(tile_size=8, leaf="union", block_px=32)
    m = np.array(
        [[0.6, 0.15, 0.2], [-0.15, 0.6, -0.1], [0, 0, 1]], np.float32
    )
    img = r.render_unrolled(m, tile_size=8, leaf="union", block_px=32)
    assert r.union_stats["n_fallback"] > 16  # stale plan -> fallback
    _check_exact(img, r.render_brute(m))     # ... but still exact
    for _ in range(240):
        if not r._uplan_refresh.get((8, 32)):
            break
        time.sleep(0.5)
    img2 = r.render_unrolled(m, tile_size=8, leaf="union", block_px=32)
    assert r.union_stats["n_fallback"] == 0  # refreshed plan fits
    _check_exact(img2, r.render_brute(m))
