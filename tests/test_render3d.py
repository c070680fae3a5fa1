"""3D voxel renderer tests: tiled MPR pipeline vs dense brute force,
plus closed-form checks on an analytic sphere (the reference's
voxel_render.rs:13-60 strategy)."""

import numpy as np
import pytest

from fidget_tpu import Context, Tree, Var, lower
from fidget_tpu.render.region import VoxelSize
from fidget_tpu.render.render3d import VoxelRenderer
from fidget_tpu.shape import Shape


def sphere_tape(r=0.6):
    ctx = Context()
    x, y, z = ctx.x(), ctx.y(), ctx.z()
    r2 = ctx.add(ctx.square(x), ctx.add(ctx.square(y), ctx.square(z)))
    return lower(ctx, [ctx.sub(ctx.sqrt(r2), r)])


def gyroid_sphere_tape(scale=4.0):
    x, y, z = Tree.axes()
    xs, ys, zs = x * scale, y * scale, z * scale
    g = (
        xs.sin() * ys.cos() + ys.sin() * zs.cos() + zs.sin() * xs.cos()
    )
    fill = abs(g) - 0.2
    sphere = (xs.square() + ys.square() + zs.square()).sqrt() - scale * 0.8
    return Shape.from_tree(sphere.max(fill)).tape()


def _check_depth_matches_brute(tape, n=64, **kw):
    # bucketed (specialize=False) so every shape in this file shares
    # one compiled frame per geometry — the specialized path has its
    # own dedicated tests below
    kw.setdefault("specialize", False)
    r = VoxelRenderer(
        tape, VoxelSize(n, n, n), tile_size=32, sub_size=8,
        interpret=True, **kw,
    )
    img = r.render(mode="heightmap")
    brute = r.render_brute()
    np.testing.assert_array_equal(img.depth, brute.depth)
    return r, img


def test_sphere_depth_matches_brute():
    _check_depth_matches_brute(sphere_tape())


def test_gyroid_sphere_depth_matches_brute():
    _check_depth_matches_brute(gyroid_sphere_tape())


def test_bucketed_mode_shares_compiles_and_is_exact():
    """specialize=False runs the zero-recompile bucketed pipeline
    (arena + axis indices as traced operands, like the 2D default
    render() path): two different shapes in the same capacity bucket
    must share one compiled frame and still match brute force exactly,
    including normals."""
    from fidget_tpu.render import render3d

    n = 32
    sph = sphere_tape()
    gyr = gyroid_sphere_tape()
    misses_after_first = None
    for tape in (sph, gyr):
        r = VoxelRenderer(
            tape, VoxelSize(n, n, n), tile_size=16, sub_size=8,
            interpret=True, specialize=False,
        )
        img = r.render(mode="heightmap")
        np.testing.assert_array_equal(img.depth, r.render_brute().depth)
        nm = r.render(mode="normals")
        np.testing.assert_array_equal(nm.depth, img.depth)
        if misses_after_first is None:
            misses_after_first = render3d._frame3_bucketed_fn.cache_info().misses
    # both shapes hit the same bucket: the second shape must add no new
    # frame builders (other tests may have pre-populated the bucket, so
    # the first shape's absolute miss count is not asserted)
    assert (
        render3d._frame3_bucketed_fn.cache_info().misses
        == misses_after_first
    ), "bucketed pipeline did not share compiled frames across shapes"


def test_strata_loop_matches_scan_and_brute():
    """The host-side strata drivers — 'loop' (one fused dispatch per
    stratum) and 'stages' (proofs | host compaction | leaf | fold
    dispatches, the 1024^3 correctness path where both fused drivers
    hit XLA:TPU faults, demos/probe_1024.py) — must produce
    bit-identical depth to the fused scan path and the brute oracle,
    including normals."""
    tape = gyroid_sphere_tape()
    n = 32  # (16, 8) keeps 2 strata; driver logic is size-independent
    # the scan reference rides the shared bucketed frame (the
    # specialized scan pipeline has its own dedicated tests)
    r_scan = VoxelRenderer(
        tape, VoxelSize(n, n, n), tile_size=16, sub_size=8,
        interpret=True, strata="scan", specialize=False,
    )
    a = r_scan.render(mode="normals")
    brute = r_scan.render_brute()
    for strata in ("loop", "stages"):
        r = VoxelRenderer(
            tape, VoxelSize(n, n, n), tile_size=16, sub_size=8,
            interpret=True, strata=strata,
        )
        b = r.render(mode="normals")
        np.testing.assert_array_equal(a.depth, b.depth)
        np.testing.assert_allclose(
            a.normal, b.normal, rtol=1e-6, atol=1e-6
        )
        np.testing.assert_array_equal(b.depth, brute.depth)


@pytest.mark.parametrize("strata", ("loop", "stages"))
def test_strata_loop_overflow_retry(strata):
    """Capacity overflow inside the host drivers retries exactly like
    the fused path."""
    tape = gyroid_sphere_tape()
    r = VoxelRenderer(
        tape, VoxelSize(32, 32, 32), tile_size=16, sub_size=8,
        interpret=True, strata=strata, cap=8,
    )
    img = r.render(mode="heightmap")
    brute = r.render_brute()
    np.testing.assert_array_equal(img.depth, brute.depth)
    assert r.cap > 8


def test_sphere_depth_closed_form():
    n = 64
    r = VoxelRenderer(
        sphere_tape(0.6), VoxelSize(n, n, n), tile_size=32, sub_size=8,
        interpret=True, specialize=False,
    )
    img = r.render(mode="heightmap")
    # closed form: depth = floor(z_surface in voxel coords) + 1
    s2w = r.s2w
    for py, px in [(32, 32), (28, 36), (20, 32)]:
        wx = s2w[0, 0] * px + s2w[0, 3]
        wy = s2w[1, 1] * py + s2w[1, 3]
        rr = wx * wx + wy * wy
        d = int(img.depth[py, px])
        if rr > 0.6**2:
            assert d == 0
        else:
            wz = np.sqrt(0.6**2 - rr)
            pz = (wz - s2w[2, 3]) / s2w[2, 2]
            assert abs(d - 1 - np.floor(pz)) <= 1.0, (py, px, d, pz)


def test_sphere_normals_radial():
    n = 64
    r = VoxelRenderer(
        sphere_tape(0.6), VoxelSize(n, n, n), tile_size=32, sub_size=8,
        interpret=True, specialize=False,
    )
    img = r.render(mode="normals")
    s2w = r.s2w
    ys, xs = np.nonzero(img.depth)
    sel = (np.arange(len(ys)) % 57) == 0
    for py, px in zip(ys[sel], xs[sel]):
        d = img.depth[py, px]
        wx = s2w[0, 0] * px + s2w[0, 3]
        wy = s2w[1, 1] * py + s2w[1, 3]
        wz = s2w[2, 2] * (d - 1) + s2w[2, 3]
        expect = np.array([wx, wy, wz])
        expect /= np.linalg.norm(expect)
        got = img.normal[py, px]
        assert np.dot(got, expect) > 0.98, (py, px, got, expect)


def test_empty_and_full_volumes():
    ctx = Context()
    # plane z - 10 < 0 everywhere in the ±1 cube: fully saturated
    t_full = lower(ctx, [ctx.sub(ctx.z(), 10.0)])
    r = VoxelRenderer(
        t_full, VoxelSize(64, 64, 64), tile_size=32, sub_size=8,
        interpret=True, specialize=False,
    )
    img = r.render(mode="normals")
    assert (img.depth == 64).all()
    np.testing.assert_allclose(
        img.normal, np.broadcast_to([0.0, 0.0, 1.0], img.normal.shape)
    )
    ctx2 = Context()
    t_empty = lower(ctx2, [ctx2.sub(10.0, ctx2.z())])
    r2 = VoxelRenderer(
        t_empty, VoxelSize(64, 64, 64), tile_size=32, sub_size=8,
        interpret=True, specialize=False,
    )
    img2 = r2.render(mode="normals")
    assert (img2.depth == 0).all()
    np.testing.assert_allclose(img2.normal, 0.0)


def test_overflow_retry():
    # gyroid with tiny capacity: must auto-double and still be exact
    tape = gyroid_sphere_tape()
    r = VoxelRenderer(
        tape, VoxelSize(32, 32, 32), tile_size=16, sub_size=8, cap=8,
        interpret=True, specialize=False,
    )
    img = r.render(mode="heightmap", max_retries=8)
    brute = r.render_brute()
    np.testing.assert_array_equal(img.depth, brute.depth)
    assert r.cap > 8


def test_shape_var_and_transform():
    rv = Var.new()
    x, y, z = Tree.axes()
    tree = (x.square() + y.square() + z.square()).sqrt() - Tree.var(rv)
    shape = Shape.from_tree(tree).apply_transform(
        np.diag([2.0, 2.0, 2.0, 1.0])  # model = 2 * world
    )
    n = 64
    r = VoxelRenderer(
        shape, VoxelSize(n, n, n), tile_size=32, sub_size=8,
        interpret=True, specialize=False,
    )
    img = r.render(vars={rv: 0.8}, mode="heightmap")
    brute = r.render_brute(vars={rv: 0.8})
    np.testing.assert_array_equal(img.depth, brute.depth)
    # world radius = 0.8 / 2 = 0.4: center column depth matches
    s2w = r.s2w
    pz = (0.4 - s2w[2, 3]) / s2w[2, 2]
    assert abs(int(img.depth[32, 32]) - 1 - np.floor(pz)) <= 1.0


def test_sharded_voxels_matches_single_device():
    import jax

    from fidget_tpu.parallel.sharding import make_mesh, render_voxels_sharded

    # 2 devices keep the volume at the suite's shared 64^3 geometry
    # (cross-device logic errors already show at 2; the 8-device case
    # is exercised by dryrun_multichip)
    n_dev = min(2, jax.device_count())
    if n_dev < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = make_mesh(n_dev)
    tape = gyroid_sphere_tape()
    size = VoxelSize(32, 16 * n_dev, 32)
    img = render_voxels_sharded(
        tape, size, mesh, tile_size=16, sub_size=8, mode="normals",
        interpret=True,
    )
    single = VoxelRenderer(
        tape, size, tile_size=16, sub_size=8, interpret=True,
        specialize=False,
    )
    ref = single.render(mode="normals")
    np.testing.assert_array_equal(img.depth, ref.depth)
    np.testing.assert_allclose(img.normal, ref.normal, rtol=1e-5, atol=1e-5)
    # the tiled-unrolled 3D pipeline shards through the same path
    uimg = render_voxels_sharded(
        tape, size, mesh, tile_size=16, sub_size=8, mode="heightmap",
        interpret=True, leaf="unrolled", proofs="unrolled",
    )
    np.testing.assert_array_equal(uimg.depth, ref.depth)


def test_perspective_camera_matches_brute():
    # perspective: w-row z coefficient (demos/cli/src/main.rs:870-873);
    # the interval transform widens through the interval division
    mat = np.eye(4)
    mat[3, 2] = 0.3
    r = VoxelRenderer(
        sphere_tape(0.6), VoxelSize(64, 64, 64), tile_size=32, sub_size=8,
        interpret=True, specialize=False,
    )
    img = r.render(mat, mode="heightmap")
    brute = r.render_brute(mat)
    np.testing.assert_array_equal(img.depth, brute.depth)
    assert img.depth.max() > 0


def test_fused_voxel_depth_configs():
    # the interp_voxel_depth kernel path (sub^2 % 128 == 0) must agree
    # exactly with brute force for every tile geometry, including the
    # nl=2 config that miscompiled via the unfused XLA reduce on TPU
    tape = gyroid_sphere_tape()
    brute = None
    for ts, sub in ((64, 16), (32, 16), (64, 32)):
        r = VoxelRenderer(
            tape, VoxelSize(64, 64, 64), tile_size=ts, sub_size=sub,
            interpret=True,
        )
        if brute is None:
            brute = r.render_brute()
        img = r.render(mode="heightmap")
        np.testing.assert_array_equal(img.depth, brute.depth)


def test_voxel_tiles_per_step_exact():
    # grid batching in the voxel pass (interp_voxel_depth
    # tiles_per_step > 1) must not change a single depth value; g=3
    # exercises both the inner tile loop AND the non-divisible-cap
    # zero-padding in one compile
    tape = gyroid_sphere_tape()
    r = VoxelRenderer(
        tape, VoxelSize(64, 64, 64), tile_size=64, sub_size=16,
        interpret=True, voxel_tiles_per_step=3,
    )
    img = r.render(mode="heightmap")
    np.testing.assert_array_equal(img.depth, r.render_brute().depth)


def test_unrolled_leaf_exact():
    # the tiled-unrolled 3D leaf (whole tape as straight-line XLA over
    # the compacted worklist) must agree exactly with brute force and
    # with the interpreter leaf, across strata drivers
    tape = gyroid_sphere_tape()
    brute = None
    # two configs cover both axes: (fused scan x interp proofs) and
    # (stages driver x fully-unrolled proofs)
    for strata, proofs in (("scan", "interp"), ("stages", "unrolled")):
        r = VoxelRenderer(
            tape, VoxelSize(64, 64, 64), tile_size=32, sub_size=8,
            interpret=True, leaf="unrolled", strata=strata, proofs=proofs,
        )
        if brute is None:
            brute = r.render_brute()
        img = r.render(mode="heightmap")
        np.testing.assert_array_equal(img.depth, brute.depth)
    # unrolled normals (jvp over the whole-tape evaluator): unit length
    # and equal to the interpreter grad kernel's normals (same
    # geometry, same surface voxels)
    rs = VoxelRenderer(
        sphere_tape(0.6), VoxelSize(64, 64, 64), tile_size=32,
        sub_size=8, interpret=True, leaf="unrolled", proofs="unrolled",
    )
    nimg = rs.render(mode="normals")
    hit = nimg.depth > 0
    np.testing.assert_allclose(
        np.linalg.norm(nimg.normal[hit], axis=-1), 1.0, atol=1e-4
    )
    ref = VoxelRenderer(
        sphere_tape(0.6), VoxelSize(64, 64, 64), tile_size=32,
        sub_size=8, interpret=True, specialize=False,
    ).render(mode="normals")
    np.testing.assert_array_equal(nimg.depth, ref.depth)
    np.testing.assert_allclose(
        nimg.normal, ref.normal, rtol=1e-4, atol=1e-4
    )

    # bucketed path cannot take the unrolled leaf
    with pytest.raises(ValueError, match="specialize"):
        VoxelRenderer(
            tape, VoxelSize(64, 64, 64), interpret=True,
            leaf="unrolled", specialize=False,
        )
    # unrolled proofs capture no choices: interpreter leaf refused
    with pytest.raises(ValueError, match="choice"):
        VoxelRenderer(
            tape, VoxelSize(64, 64, 64), interpret=True,
            proofs="unrolled",
        )


def test_3d_async_warmup():
    """render(warmup='interp') serves exact frames via the bucketed
    twin while the specialized pipeline compiles in the background,
    then switches to the compiled executable."""
    import time

    from fidget_tpu.render import render2d as r2d

    tape = gyroid_sphere_tape()
    r = VoxelRenderer(
        tape, VoxelSize(64, 64, 64), tile_size=32, sub_size=8,
        interpret=True,
    )
    brute = r.render_brute()
    img = r.render(mode="heightmap", warmup="interp")
    np.testing.assert_array_equal(img.depth, brute.depth)
    deadline = time.time() + 300
    while time.time() < deadline:
        states = [
            v for k, v in r2d._UWARM.items()
            if k[0] == "3d" and k[1] == id(r.tape)
        ]
        if states and all(not isinstance(v, str) for v in states):
            break
        time.sleep(0.5)
    else:
        pytest.fail("background 3D compile never finished")
    img2 = r.render(mode="heightmap", warmup="interp")
    np.testing.assert_array_equal(img2.depth, brute.depth)


def test_formerly_fenced_configs_construct():
    # (tile=32, sub=16) at >=512^3 used to crash the TPU worker via the
    # pre-f56c4a6 liveness-kernel OOB write and was refused by the
    # constructor; the 2026-08-20 hardware re-probe (demos/probe_crash.py)
    # confirmed the fix, so every config constructs and autos to the
    # fused scan driver at any size.
    from fidget_tpu.render.region import VoxelSize

    tape = gyroid_sphere_tape()
    for interpret in (False, True):
        r = VoxelRenderer(
            tape, VoxelSize(512, 512, 512), tile_size=32, sub_size=16,
            interpret=interpret,
        )
        assert r._strata_mode() == "scan"
    big = VoxelRenderer(
        tape, VoxelSize(1024, 1024, 1024), interpret=True,
    )
    assert big._strata_mode() == "scan"


def test_mesh_and_3d_cancellation():
    from fidget_tpu.mesh import Settings, build_mesh
    from fidget_tpu.render.config import CancelToken, RenderCancelled
    from fidget_tpu.render.region import VoxelSize

    tape = gyroid_sphere_tape()
    tok = CancelToken()
    tok.cancel()
    with pytest.raises(RenderCancelled):
        build_mesh(tape, Settings(depth=3, cancel=tok, interpret=True))
    r = VoxelRenderer(
        tape, VoxelSize(32, 32, 32), tile_size=16, sub_size=8,
        interpret=True,
    )
    with pytest.raises(RenderCancelled):
        r.render(mode="heightmap", cancel=tok)


def test_sphere_var_closed_form():
    """The reference's Var-radius analytic-sphere check
    (fidget/tests/voxel_render.rs:13-75): render at two View3 scales
    and two ShapeVars radii, then verify every non-saturated voxel
    against the closed form with the same 2-voxel epsilon."""
    from fidget_tpu.gui import View3

    ctx = Context()
    v = Var.new()
    r2 = ctx.add(
        ctx.square(ctx.x()),
        ctx.add(ctx.square(ctx.y()), ctx.square(ctx.z())),
    )
    tape = lower(ctx, [ctx.sub(ctx.sqrt(r2), ctx.input(v))])

    size = 32
    vsize = VoxelSize(size, size, size)
    s2w = vsize.screen_to_world()
    xs, ys = np.meshgrid(
        np.arange(size, dtype=np.float64),
        np.arange(size, dtype=np.float64),
    )
    renderer = VoxelRenderer(
        tape, vsize, tile_size=16, sub_size=8,
        interpret=True, specialize=False,
    )
    for scale in (1.0, 0.5):
        w2m = View3.from_center_and_scale(
            np.zeros(3), scale
        ).world_to_model()
        for rad in (0.5, 0.75):
            img = renderer.render(w2m, vars={v: rad}, mode="heightmap")
            depth = img.depth.astype(np.float64)
            eps = 2.0 / size / scale * 2.0
            pts = np.stack(
                [xs, ys, depth, np.ones_like(xs)], axis=-1
            ) @ s2w.T
            pos = pts[..., :3] * scale
            sat = img.depth >= size
            empty = (img.depth == 0) & ~sat
            filled = ~empty & ~sat
            rr_xy = np.hypot(pos[..., 0], pos[..., 1])
            assert (
                rr_xy[empty] + eps > rad
            ).all(), "empty column inside the sphere"
            rr = np.linalg.norm(pos, axis=-1)
            err = np.abs(rr - rad)
            assert (
                err[filled] < eps
            ).all(), f"max depth error {err[filled].max()} >= {eps}"


def test_sphere_var_closed_form():
    """Mirrors the reference's analytic voxel test
    (fidget/tests/voxel_render.rs:13-60): a sphere with a Var radius
    rendered at 32^3 under two view scales; every non-saturated
    column's depth must match the closed form within a 2-voxel
    epsilon, and empty columns must lie outside the radius."""
    ctx = Context()
    rv = Var.new()
    x, y, z = ctx.x(), ctx.y(), ctx.z()
    r2 = ctx.add(ctx.square(x), ctx.add(ctx.square(y), ctx.square(z)))
    tape = lower(ctx, [ctx.sub(ctx.sqrt(r2), ctx.input(rv))])

    size = 32
    for scale in (1.0, 0.5):
        w2m = np.diag([scale, scale, scale, 1.0]).astype(np.float32)
        for radius in (0.5, 0.75):
            r = VoxelRenderer(
                tape, VoxelSize(size, size, size), tile_size=16,
                sub_size=8, interpret=True, specialize=False,
            )
            img = r.render(
                w2m, vars={rv: radius}, mode="heightmap"
            )
            eps = 2.0 / size / scale * 2.0
            s2w = np.asarray(r.s2w)
            ys_, xs_ = np.mgrid[0:size, 0:size].astype(np.float64)
            depth = img.depth.astype(np.float64)
            sat = depth >= size
            pos = np.stack(
                [xs_, ys_, depth, np.ones_like(xs_)], axis=-1
            ) @ s2w.T * scale
            empty = (depth == 0) & ~sat
            rxy = np.sqrt(pos[..., 0] ** 2 + pos[..., 1] ** 2)
            assert (rxy[empty] >= radius - eps).all()
            hit = (depth > 0) & ~sat
            rr = np.sqrt((pos[hit][:, :3] ** 2).sum(axis=1))
            np.testing.assert_allclose(
                rr, radius, atol=eps,
                err_msg=f"scale={scale} radius={radius}",
            )


def test_strata_schedule_matches_uniform():
    """The per-stratum capacity schedule (segmented lax.scan chain)
    must produce bit-identical depths to the uniform-cap scan, and
    render() must adopt it after the first frame."""
    import jax.numpy as jnp

    # a small sphere: outer z-strata hold almost no active subtiles,
    # so the schedule is guaranteed to beat the uniform cap
    tape = sphere_tape(0.5)
    n = 64
    r = VoxelRenderer(
        tape, VoxelSize(n, n, n), tile_size=16, sub_size=8,
        interpret=True,
    )
    img1 = r.render(mode="heightmap")   # uniform; builds the schedule
    assert r._sched is not None and len(r._sched) == r.ntz
    assert sum(r._sched) < r.ntz * min(
        r.cap, r.nl * r.ny2 * r.nx2
    )
    img2 = r.render(mode="heightmap")   # scheduled path
    np.testing.assert_array_equal(img1.depth, img2.depth)
    # explicit scheduled call agrees and reports zero overflow
    matM = jnp.asarray(r._mat4(None))
    vec = jnp.asarray(r._var_vec(None))
    depth, _, n_over = r._frame_impl(
        matM, vec, mode="heightmap", cap=r.cap, strata_caps=r._sched
    )
    assert int(n_over) == 0
    np.testing.assert_array_equal(np.asarray(depth), img1.depth)
    # a deliberately starved schedule must report overflow, and
    # render() must recover by rebuilding
    tiny = tuple(8 for _ in r._sched)
    _, _, n_over2 = r._frame_impl(
        matM, vec, mode="heightmap", cap=r.cap, strata_caps=tiny
    )
    assert int(n_over2) > 0
    r._sched = tiny
    img3 = r.render(mode="heightmap")
    np.testing.assert_array_equal(img3.depth, img1.depth)
