"""2D renderer golden tests: tiled MPR pipeline vs dense brute force.

The brute-force unrolled evaluation is the ground-truth oracle for all
culling/simplification paths (the reference validates against golden
images the same way, fidget/tests/pixel_render.rs:40-107).
"""

import numpy as np
import pytest

from fidget_tpu import Context, lower
from fidget_tpu.io.models import has_model, load_vm
from fidget_tpu.render.region import ImageSize
from fidget_tpu.render.render2d import FILL_NONE, PixelRenderer


def _check_matches_brute(tape, n=128, tile_size=64, world_to_model=None, z=0.0):
    r = PixelRenderer(
        tape, ImageSize(n, n), tile_size=tile_size, interpret=True
    )
    img = r.render(world_to_model, z=z)
    brute = r.render_brute(world_to_model, z=z)
    evaluated = img.fill == FILL_NONE
    # where evaluated, distances must match the oracle closely
    np.testing.assert_allclose(
        img.distance[evaluated], brute[evaluated], rtol=1e-5, atol=1e-6
    )
    # fills must be conservative truths
    inside_fill = img.fill == 1
    outside_fill = img.fill == 2
    assert np.all(brute[inside_fill] < 0), "inside fill covers non-inside px"
    assert np.all(brute[outside_fill] > 0), "outside fill covers inside px"
    # final occupancy identical
    np.testing.assert_array_equal(img.inside(), brute < 0)
    return img


def test_circle_tiled_matches_brute():
    ctx = Context()
    x, y = ctx.x(), ctx.y()
    f = ctx.sub(ctx.sqrt(ctx.add(ctx.square(x), ctx.square(y))), 0.6)
    tape = lower(ctx, [f])
    _check_matches_brute(tape)
    # with an 8x8 tile grid (tile = 0.25 world units), interior and
    # exterior tiles are provable and must be filled, not evaluated
    img = _check_matches_brute(tape, n=512)
    assert (img.fill == 1).any() and (img.fill == 2).any()


def test_spiky_tiled_matches_brute():
    ctx = Context()
    x, y = ctx.x(), ctx.y()
    r = ctx.sqrt(ctx.add(ctx.square(x), ctx.square(y)))
    f = ctx.min(
        ctx.sub(r, 0.8),
        ctx.max(ctx.sub(ctx.abs(x), 0.3), ctx.sub(ctx.abs(y), 0.9)),
    )
    tape = lower(ctx, [f])
    _check_matches_brute(tape)


def test_pixel_perfect_evaluates_everything():
    ctx = Context()
    x, y = ctx.x(), ctx.y()
    f = ctx.sub(ctx.sqrt(ctx.add(ctx.square(x), ctx.square(y))), 0.6)
    tape = lower(ctx, [f])
    r = PixelRenderer(tape, ImageSize(128, 128), interpret=True)
    img = r.render(pixel_perfect=True)
    assert (img.fill == FILL_NONE).all()
    brute = r.render_brute()
    np.testing.assert_allclose(img.distance, brute, rtol=1e-5, atol=1e-6)


def test_transform_and_z():
    ctx = Context()
    x, y, z = ctx.x(), ctx.y(), ctx.z()
    # sphere: depends on z
    f = ctx.sub(
        ctx.sqrt(ctx.add(ctx.square(x), ctx.add(ctx.square(y), ctx.square(z)))),
        0.9,
    )
    tape = lower(ctx, [f])
    m = np.array([[2.0, 0, 0.1], [0, 2.0, -0.2], [0, 0, 1]])
    _check_matches_brute(tape, world_to_model=m, z=0.5)


def test_non_square_image():
    ctx = Context()
    x, y = ctx.x(), ctx.y()
    f = ctx.sub(ctx.sqrt(ctx.add(ctx.square(x), ctx.square(y))), 0.6)
    tape = lower(ctx, [f])
    r = PixelRenderer(tape, ImageSize(192, 128), interpret=True)
    img = r.render()
    brute = r.render_brute()
    assert img.distance.shape == (128, 192)
    np.testing.assert_array_equal(img.inside(), brute < 0)


@pytest.mark.skipif(not has_model("hi.vm"), reason="models unavailable")
def test_hi_vm_matches_brute():
    ctx, root = load_vm("hi.vm")
    tape = lower(ctx, [root])
    img = _check_matches_brute(tape, n=128)
    ink = img.inside().mean()
    assert 0.01 < ink < 0.5  # the 'hi' glyphs occupy a small fraction


@pytest.mark.skipif(not has_model("quarter.vm"), reason="models unavailable")
def test_quarter_vm_matches_brute():
    ctx, root = load_vm("quarter.vm")
    tape = lower(ctx, [root])
    _check_matches_brute(tape, n=128)


@pytest.mark.skipif(not has_model("prospero.vm"), reason="models unavailable")
def test_prospero_vm_matches_brute():
    # the 6,461-op flagship tape end-to-end through the bucketed
    # pipeline: exercises the big (capacity=8192, nf=128) kernel bucket
    # no other test reaches
    from fidget_tpu.io.models import load_vm_tape

    tape = load_vm_tape("prospero.vm")
    assert tape.reg_count > 100
    img = _check_matches_brute(tape, n=128, tile_size=128)
    assert 0.1 < img.inside().mean() < 0.9


def test_spilled_tape_matches_brute():
    # force register spills (mem_count > 0) and render end-to-end:
    # the packed Mem-merged LOAD/STORE slots must be transparent to
    # the whole pipeline, not just the kernel-level op tests
    ctx = Context()
    x, y = ctx.x(), ctx.y()
    f = ctx.sub(ctx.sqrt(ctx.add(ctx.square(x), ctx.square(y))), 0.6)
    for cx, cy in ((0.5, 0.3), (-0.4, 0.2), (0.1, -0.5)):
        g = ctx.sub(
            ctx.sqrt(
                ctx.add(
                    ctx.square(ctx.sub(ctx.x(), cx)),
                    ctx.square(ctx.sub(ctx.y(), cy)),
                )
            ),
            0.25,
        )
        f = ctx.min(f, g)
    tape = lower(ctx, [f], reg_limit=4)
    assert tape.mem_count > 0, "reg_limit did not force spills"
    _check_matches_brute(tape, n=128)


def test_render_shape_with_transform_and_vars():
    from fidget_tpu import Tree, Var
    from fidget_tpu.shape import Shape

    r_var = Var.new()
    x, y, z = Tree.axes()
    tree = (x.square() + y.square()).sqrt() - Tree.var(r_var)
    # shrink model 2x: world-space radius doubles
    shape = Shape.from_tree(tree).apply_transform(np.diag([0.5, 0.5, 0.5, 1.0]))
    pr = PixelRenderer(shape, ImageSize(128, 128), interpret=True)
    img = pr.render(vars={r_var: 0.4})
    brute = pr.render_brute(vars={r_var: 0.4})
    evaluated = img.fill == FILL_NONE
    np.testing.assert_allclose(
        img.distance[evaluated], brute[evaluated], rtol=1e-5, atol=1e-6
    )
    # radius 0.4 in model space = 0.8 world: check occupancy fraction
    frac = img.inside().mean()
    expect = np.pi * 0.8**2 / 4.0  # circle area / [-1,1]^2 area
    assert abs(frac - expect) < 0.01


def test_render_shape_unbound_var_raises():
    from fidget_tpu import Tree, Var
    from fidget_tpu.shape import Shape

    x, y, _ = Tree.axes()
    tree = (x.square() + y.square()).sqrt() - Tree.var(Var.new())
    pr = PixelRenderer(Shape.from_tree(tree), ImageSize(64, 64), interpret=True)
    with pytest.raises(ValueError):
        pr.render()


def test_two_level_matches_brute():
    if not has_model("hi.vm"):
        pytest.skip("model assets unavailable")
    ctx, root = load_vm("hi.vm")
    tape = lower(ctx, [root])
    r = PixelRenderer(
        tape, ImageSize(256, 256), tile_sizes=(128, 32), interpret=True
    )
    img = r.render()
    brute = r.render_brute()
    evaluated = img.fill == FILL_NONE
    np.testing.assert_allclose(
        img.distance[evaluated], brute[evaluated], rtol=1e-5, atol=1e-6
    )
    assert (img.inside() == (brute < 0)).all()
    # pixel_perfect: every pixel evaluated, still exact
    img2 = r.render(pixel_perfect=True)
    assert (img2.fill == FILL_NONE).all()
    np.testing.assert_allclose(img2.distance, brute, rtol=1e-5, atol=1e-6)


def test_two_level_spiky():
    ctx = Context()
    x, y = ctx.x(), ctx.y()
    r2 = ctx.add(ctx.square(x), ctx.square(y))
    wave = ctx.mul(0.3, ctx.sin(ctx.mul(10.0, ctx.atan2(y, x))))
    tape = lower(ctx, [ctx.sub(ctx.sqrt(r2), ctx.add(0.6, wave))])
    r = PixelRenderer(
        tape, ImageSize(256, 256), tile_sizes=(64, 16), interpret=True
    )
    img = r.render()
    brute = r.render_brute()
    evaluated = img.fill == FILL_NONE
    # atol covers XLA-vs-numpy transcendental ULP differences
    np.testing.assert_allclose(
        img.distance[evaluated], brute[evaluated], rtol=1e-5, atol=5e-6
    )
    assert (img.inside() == (brute < 0)).all()


def test_sharded_tiles_matches_brute():
    import jax

    from fidget_tpu.parallel.sharding import make_mesh, render_tiles_sharded

    n_dev = min(4, jax.device_count())
    if n_dev < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = make_mesh(n_dev)
    ctx = Context()
    x, y = ctx.x(), ctx.y()
    tape = lower(
        ctx, [ctx.sub(ctx.sqrt(ctx.add(ctx.square(x), ctx.square(y))), 0.7)]
    )
    size = ImageSize(256, 128 * n_dev)
    img = render_tiles_sharded(
        tape, size, mesh, tile_sizes=(128, 32), interpret=True
    )
    r = PixelRenderer(tape, size, interpret=True)
    brute = r.render_brute()
    evaluated = img.fill == FILL_NONE
    np.testing.assert_allclose(
        img.distance[evaluated], brute[evaluated], rtol=1e-5, atol=1e-6
    )
    assert (img.inside() == (brute < 0)).all()


def test_constant_shape_renders():
    # a constant-only tape (no spatial inputs): everything filled
    ctx = Context()
    tape = lower(ctx, [ctx.constant(-1.0)])
    r = PixelRenderer(tape, ImageSize(64, 64), interpret=True)
    img = r.render()
    assert img.inside().all()
    ctx2 = Context()
    tape2 = lower(ctx2, [ctx2.constant(2.0)])
    r2 = PixelRenderer(tape2, ImageSize(64, 64), interpret=True)
    assert not r2.render().inside().any()


def test_render_layers_compositing():
    from fidget_tpu.render.compose import render_layers
    from fidget_tpu.script import eval_script

    res = eval_script("""
        draw_rgb(circle(#{ radius: 0.8 }), 1.0, 0.0, 0.0);
        draw_rgb(circle(#{ center: [0.4, 0], radius: 0.3 }), 0.0, 1.0, 0.0);
    """)
    rgb = render_layers(
        res.shapes, ImageSize(64, 64), colors=res.colors, interpret=True
    )
    assert rgb.shape == (64, 64, 3)
    # center: red base circle
    assert tuple(rgb[32, 32]) == (255, 0, 0)
    # later green circle drawn OVER the red one
    assert tuple(rgb[32, 32 + 13]) == (0, 255, 0)
    # outside: background
    assert tuple(rgb[2, 2]) == (0, 0, 0)


def test_render_dense_matches_brute():
    # the compiled-per-shape dense path (fidget --eval=jit analog)
    from fidget_tpu.io.models import has_model, load_vm_tape

    if has_model("hi.vm"):
        tape = load_vm_tape("hi.vm")
    else:
        from fidget_tpu.shape import Shape, Tree

        x, y, _ = Tree.axes()
        tape = Shape.from_tree(
            (x.square() + y.square()).sqrt() - 0.7
        ).tape()
    r = PixelRenderer(tape, ImageSize(96, 128), interpret=True)
    img = r.render_dense()
    brute = r.render_brute()
    np.testing.assert_allclose(img.distance, brute, rtol=1e-5, atol=1e-6)
    assert (img.fill == 0).all()


def test_specialized_render_matches_bucketed():
    from fidget_tpu.io.models import has_model, load_vm_tape

    if has_model("hi.vm"):
        tape = load_vm_tape("hi.vm")
    else:
        from fidget_tpu.shape import Shape, Tree

        x, y, _ = Tree.axes()
        tape = Shape.from_tree((x.square() + y.square()).sqrt() - 0.7).tape()
    ra = PixelRenderer(tape, ImageSize(128, 128), tile_size=64, interpret=True)
    rb = PixelRenderer(
        tape, ImageSize(128, 128), tile_size=64, interpret=True,
        specialize=True,
    )
    a = ra.render()
    b = rb.render()
    np.testing.assert_array_equal(a.fill, b.fill)
    ev = a.fill == 0
    np.testing.assert_allclose(
        a.distance[ev], b.distance[ev], rtol=1e-5, atol=1e-5
    )


def test_fill_level_tags_two_level():
    # two-level renders tag subtile-proven fills with level 1 and
    # root-proven fills with level 0 (the reference's per-fill depth,
    # fidget-raster/src/pixel.rs:176-230)
    ctx = Context()
    x, y = ctx.x(), ctx.y()
    f = ctx.sub(ctx.sqrt(ctx.add(ctx.square(x), ctx.square(y))), 0.6)
    tape = lower(ctx, [f])
    r = PixelRenderer(
        tape, ImageSize(256, 256), tile_sizes=(128, 32), interpret=True
    )
    img = r.render()
    lvl = img.fill_level()
    assert (lvl[img.fill == FILL_NONE] == -1).all()
    assert (lvl == 1).any(), "expected some subtile-level fills"
    # fill_class strips the tags back to the classic codes
    assert set(np.unique(img.fill_class())) <= {0, 1, 2}
    # occupancy still exact vs brute
    brute = r.render_brute()
    np.testing.assert_array_equal(img.inside(), brute < 0)


def test_render_cancellation():
    from fidget_tpu.render.config import CancelToken, RenderCancelled

    ctx = Context()
    x, y = ctx.x(), ctx.y()
    tape = lower(ctx, [ctx.sub(ctx.sqrt(ctx.add(ctx.square(x), ctx.square(y))), 0.6)])
    r = PixelRenderer(tape, ImageSize(64, 64), interpret=True)
    tok = CancelToken()
    tok.cancel()
    with pytest.raises(RenderCancelled):
        r.render(cancel=tok)
    # un-fired token: renders normally
    assert r.render(cancel=CancelToken()).distance.shape == (64, 64)


def test_unrolled_mode_matches_brute():
    # the tiled-unrolled pipeline (fidget-JIT analog with culling):
    # cull at 16-px tiles, whole-tape XLA leaf over compacted actives
    if not has_model("hi.vm"):
        pytest.skip("model assets unavailable")
    ctx, root = load_vm("hi.vm")
    tape = lower(ctx, [root])
    r = PixelRenderer(tape, ImageSize(192, 160), interpret=True)
    img = r.render_unrolled()
    brute = r.render_brute()
    ev = img.fill == FILL_NONE
    np.testing.assert_allclose(
        img.distance[ev], brute[ev], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(img.inside(), brute < 0)
    assert ev.mean() < 0.6, "culling should skip a large fraction"
    # pixel_perfect: dense, every pixel evaluated
    img2 = r.render_unrolled(pixel_perfect=True)
    assert (img2.fill == FILL_NONE).all()
    np.testing.assert_allclose(img2.distance, brute, rtol=1e-5, atol=1e-6)
    # interpreter-cull variant (cheap-compile mode): same occupancy,
    # same evaluated distances
    img3 = r.render_unrolled(cull="interp")
    np.testing.assert_array_equal(img3.inside(), brute < 0)
    ev3 = img3.fill == FILL_NONE
    np.testing.assert_allclose(
        img3.distance[ev3], brute[ev3], rtol=1e-5, atol=1e-6
    )


def test_unrolled_8px_tiles():
    # the 8-px cull configuration (finer tiles -> ~34% evaluated on
    # prospero vs ~51% at 16 px) must stay exact: 64-pixel leaves pack
    # flat lanes, a different layout than the 256-pixel default
    if not has_model("hi.vm"):
        pytest.skip("model assets unavailable")
    ctx, root = load_vm("hi.vm")
    tape = lower(ctx, [root])
    r = PixelRenderer(tape, ImageSize(192, 160), interpret=True)
    brute = r.render_brute()
    img = r.render_unrolled(tile_size=8)
    np.testing.assert_array_equal(img.inside(), brute < 0)
    ev = img.fill == FILL_NONE
    np.testing.assert_allclose(
        img.distance[ev], brute[ev], rtol=1e-5, atol=1e-6
    )
    # finer tiles must evaluate no MORE than the 16-px default
    img16 = r.render_unrolled(tile_size=16)
    assert ev.mean() <= (img16.fill == FILL_NONE).mean() + 1e-9


def test_unrolled_sizing_cull_chunked():
    # > 4096 tiles forces the sizing cull's chunked lane-block path
    # (G > 1 in _cull_sizing_stage: 6400 tiles -> s0c=32, G=2); the
    # chunked reshape/replication must count exactly the tiles the
    # production unrolled cull marks active, and the frame itself must
    # stay exact
    import jax
    import jax.numpy as jnp

    from fidget_tpu.render.render2d import (
        _cull_unrolled_fn,
        _register_tape,
        _unrolled_cull_stage,
    )

    if not has_model("hi.vm"):
        pytest.skip("model assets unavailable")
    ctx, root = load_vm("hi.vm")
    tape = lower(ctx, [root])
    r = PixelRenderer(tape, ImageSize(640, 640), interpret=True)
    T0 = 8
    n0x = n0y = 640 // T0
    n0 = n0x * n0y
    assert n0 > 4096  # G = 2 in the sizing cull
    key = id(r.tape)
    _register_tape(key, lambda: (
        r.tape, r.packed_b, r.axis_of, r.nf_b, r.cw_b,
    ))
    tx = np.arange(n0x, dtype=np.float32) * T0
    gx, gy = np.meshgrid(tx, tx)
    x0 = jnp.asarray(gx.reshape(-1))
    y0 = jnp.asarray(gy.reshape(-1))
    mat = jnp.asarray(r._mat4(None))
    vec = jnp.zeros(r.n_inputs, jnp.float32)
    cf = _cull_unrolled_fn(key, T0, n0x, n0y, r.n_inputs, True)
    n_act_sizing = int(cf(x0, y0, mat, jnp.float32(0.0), vec))
    ri, ro = jax.jit(lambda m: _unrolled_cull_stage(
        key, T0, n0, r.n_inputs, x0, y0, m, jnp.float32(0.0), vec, True
    ))(mat)
    n_act_unrolled = int(np.asarray(~(ri | ro)).sum())
    assert n_act_sizing == n_act_unrolled
    img = r.render_unrolled(tile_size=T0)
    brute = r.render_brute()
    np.testing.assert_array_equal(img.inside(), brute < 0)


def test_unrolled_async_warmup():
    """warmup='interp' must never block on the leaf compile: early
    frames come from the interpreter pipeline (exact occupancy), and
    once the background compile lands the unrolled executable takes
    over with identical occupancy."""
    import time

    from fidget_tpu.render import render2d as r2d

    if not has_model("hi.vm"):
        pytest.skip("model assets unavailable")
    ctx, root = load_vm("hi.vm")
    tape = lower(ctx, [root])
    r = PixelRenderer(tape, ImageSize(192, 160), interpret=True)
    brute = r.render_brute()
    img = r.render_unrolled(warmup="interp")
    np.testing.assert_array_equal(img.inside(), brute < 0)
    # wait (bounded) for the background compile, then the fast path
    deadline = time.time() + 300
    while time.time() < deadline:
        states = [
            v for k, v in r2d._UWARM.items() if k[0] == id(r.tape)
        ]
        if states and all(not isinstance(v, str) for v in states):
            break
        time.sleep(0.5)
    else:
        pytest.fail("background compile never finished")
    img2 = r.render_unrolled(warmup="interp")
    np.testing.assert_array_equal(img2.inside(), brute < 0)
    ev = img2.fill == FILL_NONE
    np.testing.assert_allclose(
        img2.distance[ev], brute[ev], rtol=1e-5, atol=1e-6
    )


def test_unrolled_capacity_retry():
    ctx = Context()
    x, y = ctx.x(), ctx.y()
    tape = lower(ctx, [ctx.sub(ctx.sqrt(ctx.add(ctx.square(x), ctx.square(y))), 0.7)])
    r = PixelRenderer(tape, ImageSize(128, 128), interpret=True)
    # absurdly small starting capacity: must retry to a fitting bucket
    img = r.render_unrolled(cap=128 // 8)
    brute = r.render_brute()
    np.testing.assert_array_equal(img.inside(), brute < 0)
    # the retry must have recorded a fitting capacity for the cull
    # tile size actually used (don't hardcode the default tile)
    assert len(r._ucap) == 1
    (cap,) = r._ucap.values()
    assert cap >= 16


def test_unrolled_with_vars_and_transform():
    from fidget_tpu import Tree, Var
    from fidget_tpu.shape import Shape

    rv = Var.new()
    x, y, _ = Tree.axes()
    shape = Shape.from_tree(
        (x.square() + y.square()).sqrt() - Tree.var(rv)
    ).apply_transform(np.diag([0.5, 0.5, 1.0, 1.0]))
    r = PixelRenderer(shape, ImageSize(128, 128), interpret=True)
    img = r.render_unrolled(vars={rv: 0.4})
    brute = r.render_brute(vars={rv: 0.4})
    np.testing.assert_array_equal(img.inside(), brute < 0)


def test_unrolled_sharded_rebalances_skew():
    """Post-cull load rebalancing (the rayon work-stealing analog,
    fidget-raster/src/lib.rs:99-167): a scene whose geometry lands in
    ONE tile-row slab must still deal active tiles evenly across the
    mesh, and the result must stay exact."""
    import jax

    from fidget_tpu.parallel.sharding import (
        make_mesh,
        render_unrolled_sharded,
    )

    n_dev = min(4, jax.device_count())
    if n_dev < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = make_mesh(n_dev)
    ctx = Context()
    x, y = ctx.x(), ctx.y()
    # all geometry in the top slab: static row-sharding would leave
    # n_dev-1 devices idle
    f = ctx.sub(
        ctx.sqrt(ctx.add(ctx.square(x), ctx.square(ctx.sub(y, 0.85)))),
        0.12,
    )
    tape = lower(ctx, [f])
    size = ImageSize(128, 64 * n_dev)
    img, counts = render_unrolled_sharded(
        tape, size, mesh, interpret=True, _debug_counts=True
    )
    r = PixelRenderer(tape, size, interpret=True)
    brute = r.render_brute()
    np.testing.assert_array_equal(img.inside(), brute < 0)
    ev = img.fill == FILL_NONE
    np.testing.assert_allclose(
        img.distance[ev], brute[ev], rtol=1e-5, atol=1e-6
    )
    total = counts.sum()
    assert total > 0
    # perfect deal: no device holds more than ceil(active / D)
    assert counts.max() <= -(-int(total) // n_dev)


def test_sharded_frames_cached_across_calls():
    """Regression: the sharded entry points rebuilt their shard_map
    closures per call, so jit (keyed on function identity) re-traced
    the whole pipeline on every frame / training step."""
    import jax

    from fidget_tpu.parallel import sharding as sh

    n_dev = min(4, jax.device_count())
    if n_dev < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = sh.make_mesh(n_dev)
    ctx = Context()
    x, y = ctx.x(), ctx.y()
    tape = lower(
        ctx, [ctx.sub(ctx.sqrt(ctx.add(ctx.square(x), ctx.square(y))), 0.7)]
    )
    size = ImageSize(128, 32 * n_dev)
    before = len(sh._FN_CACHE)
    a = sh.render_tiles_sharded(tape, size, mesh, tile_sizes=(32,),
                                interpret=True)
    n_first = len(sh._FN_CACHE)
    b = sh.render_tiles_sharded(tape, size, mesh, tile_sizes=(32,),
                                interpret=True)
    assert n_first > before          # first call populated the cache
    assert len(sh._FN_CACHE) == n_first  # second call hit it
    np.testing.assert_array_equal(a.distance, b.distance)
    # fit_step: two steps reuse one compiled step function
    from fidget_tpu import Var

    ctx2 = Context()
    rv = Var.new()
    d2 = ctx2.sub(
        ctx2.sqrt(
            ctx2.add(ctx2.square(ctx2.x()), ctx2.square(ctx2.y()))
        ),
        ctx2.input(rv),
    )
    t2 = lower(ctx2, [d2])
    target = np.zeros((32 * n_dev, 32), np.float32)
    p = {rv: 0.5}
    p, l1 = sh.fit_step(t2, ImageSize(32, 32 * n_dev), mesh, p, target)
    n_after_fit = len(sh._FN_CACHE)
    p, l2 = sh.fit_step(t2, ImageSize(32, 32 * n_dev), mesh, p, target)
    assert len(sh._FN_CACHE) == n_after_fit
    assert l2 <= l1  # loss decreases with the cached step


def test_tape_registry_eviction_keeps_renders_correct():
    """The tape registry / warm caches are FIFO-bounded; eviction must
    invalidate the tape-keyed frame builders so a recycled id can never
    hit a frame compiled for a different tape, and an evicted tape must
    still render correctly afterwards (it simply re-registers)."""
    from fidget_tpu.render import render2d as r2

    ctx = Context()
    x, y = ctx.x(), ctx.y()
    ta = lower(ctx, [ctx.sub(ctx.sqrt(ctx.add(ctx.square(x), ctx.square(y))), 0.6)])
    ctx2 = Context()
    x2, y2 = ctx2.x(), ctx2.y()
    tb = lower(ctx2, [ctx2.sub(ctx2.max(ctx2.abs(x2), ctx2.abs(y2)), 0.5)])
    size = ImageSize(64, 64)
    ra = PixelRenderer(ta, size, tile_size=32, interpret=True)
    rb = PixelRenderer(tb, size, tile_size=32, interpret=True)
    old_cap = r2._REGISTRY_CAP
    try:
        r2._REGISTRY_CAP = 1
        img_a = ra.render_unrolled(tile_size=16)
        assert id(ta) in r2._TAPE_REGISTRY
        img_b = rb.render_unrolled(tile_size=16)  # evicts ta
        assert id(ta) not in r2._TAPE_REGISTRY
        assert id(tb) in r2._TAPE_REGISTRY
        # evicted tape re-registers and still renders exactly
        img_a2 = ra.render_unrolled(tile_size=16)
        np.testing.assert_array_equal(img_a.inside(), img_a2.inside())
        np.testing.assert_array_equal(
            img_a.inside(), ra.render_brute() < 0
        )
        np.testing.assert_array_equal(img_b.inside(), rb.render_brute() < 0)
    finally:
        r2._REGISTRY_CAP = old_cap
