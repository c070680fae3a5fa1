"""Pixel-gradient parity: d(rendered pixel)/d(shape parameter) vs FD.

The north-star criterion (BASELINE.md) requires pixel gradients of
rendered images w.r.t. shape parameters. The reference computes these
with forward-mode duals (fidget-core/src/types/grad.rs) and tests them
against finite differences away from discontinuities
(fidget-core/src/eval/test/grad_slice.rs). Here every differentiable
render path is checked against central finite differences of ITSELF,
and the paths are checked against each other:

  - render_dense          (whole-tape unrolled XLA, native autodiff)
  - interpreter pipeline  (Pallas kernels via the custom JVPs:
                           tangents through the dual kernel, culling
                           proofs zero-JVP)
  - tiled-unrolled frame  (_frame_unrolled_fn, pixel_perfect)
  - fit_step              (shard_map + psum reverse-mode gradient)

Test shape: circle sqrt((x-cx)^2 + y^2) - r with Var cx and Var r —
smooth everywhere except the center point, so FD is trustworthy on a
mask that excludes the center pixel.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from fidget_tpu import Context, lower  # noqa: E402
from fidget_tpu.core.var import Var  # noqa: E402
from fidget_tpu.render.region import ImageSize  # noqa: E402
from fidget_tpu.render.render2d import (  # noqa: E402
    FILL_NONE,
    PixelRenderer,
    _frame_unrolled_fn,
    _register_tape,
)

N = 64
H_FD = 1e-2


def _circle_tape():
    ctx = Context()
    cx = Var.new()
    rv = Var.new()
    x, y = ctx.x(), ctx.y()
    dx = ctx.sub(x, ctx.input(cx))
    f = ctx.sub(
        ctx.sqrt(ctx.add(ctx.square(dx), ctx.square(y))),
        ctx.input(rv),
    )
    return lower(ctx, [f]), cx, rv


def _vec(tape, cx, rv, cx_v, rv_v):
    v = np.zeros(len(tape.var_map), np.float32)
    v[tape.var_map[cx]] = cx_v
    v[tape.var_map[rv]] = rv_v
    return jnp.asarray(v)


def _check_jvp_vs_fd(f, vec, dvec, mask_center=True):
    """jax.jvp of image fn `f` against central finite differences."""
    img, tang = jax.jvp(f, (vec,), (dvec,))
    img = np.asarray(img)
    lo = np.asarray(f(vec - H_FD * dvec))
    hi = np.asarray(f(vec + H_FD * dvec))
    fd = (hi - lo) / (2 * H_FD)
    tang = np.asarray(tang)
    m = np.isfinite(fd)
    if mask_center:
        # the distance field's only kink is the circle center: exclude
        # a small disk around it (center in screen space = world 0,0)
        yy, xx = np.mgrid[0:N, 0:N]
        m &= (xx - N / 2) ** 2 + (yy - N / 2) ** 2 > 49
    assert m.mean() > 0.9
    np.testing.assert_allclose(tang[m], fd[m], rtol=2e-2, atol=2e-3)
    return img, tang


@pytest.fixture(scope="module")
def circle():
    tape, cx, rv = _circle_tape()
    return tape, cx, rv


def test_dense_pixel_gradients_vs_fd(circle):
    tape, cx, rv = circle
    r = PixelRenderer(tape, ImageSize(N, N), interpret=True)
    r.render_dense(vars={cx: 0.1, rv: 0.5})  # builds _dense_jit

    def f(vec):
        return r._dense_jit(
            jnp.asarray(r._mat4(None)), jnp.float32(0.0), vec
        )

    vec = _vec(tape, cx, rv, 0.1, 0.5)
    # d/dr: exactly -1 everywhere (away from the center kink)
    _, tang_r = _check_jvp_vs_fd(f, vec, _vec(tape, cx, rv, 0.0, 1.0))
    assert abs(np.median(tang_r) + 1.0) < 1e-4
    # d/dcx: -(x-cx)/|p - c|, non-constant
    _check_jvp_vs_fd(f, vec, _vec(tape, cx, rv, 1.0, 0.0))
    # joint direction
    _check_jvp_vs_fd(f, vec, _vec(tape, cx, rv, 0.7, -0.3))


def test_interpreter_pipeline_pixel_gradients_vs_fd(circle):
    """The zero-recompile Pallas pipeline is forward-differentiable via
    the round-3 custom JVPs; its tangents must match both FD and the
    dense unrolled path's tangents."""
    tape, cx, rv = circle
    r = PixelRenderer(tape, ImageSize(N, N), interpret=True)
    mat = jnp.asarray(r._mat4(None))

    def f(vec):
        img, fill = r._frame(mat, jnp.float32(0.0), vec, pixel_perfect=True)
        return img

    vec = _vec(tape, cx, rv, 0.1, 0.5)
    dvec = _vec(tape, cx, rv, 0.7, -0.3)
    img_i, tang_i = _check_jvp_vs_fd(f, vec, dvec)

    # cross-path agreement with the dense unrolled evaluator
    r.render_dense(vars={cx: 0.1, rv: 0.5})

    def g(vec):
        return r._dense_jit(mat, jnp.float32(0.0), vec)

    img_d, tang_d = jax.jvp(g, (vec,), (dvec,))
    np.testing.assert_allclose(img_i, np.asarray(img_d), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        tang_i, np.asarray(tang_d), rtol=1e-4, atol=1e-5
    )


def test_interpreter_pipeline_jvp_with_fills(circle):
    """Without pixel_perfect, fills are proved by the interval pass
    (zero JVP) and tangents survive only on evaluated pixels — the
    'fills carry no distance' stop-gradient contract."""
    tape, cx, rv = circle
    # 16-px tiles so the interval pass proves full/empty tiles on a
    # radius-0.8 circle (the default single 128-px tile covers the
    # whole 64^2 image and everything would be evaluated)
    r = PixelRenderer(tape, ImageSize(N, N), tile_size=16, interpret=True)
    mat = jnp.asarray(r._mat4(None))
    vec = _vec(tape, cx, rv, 0.1, 0.8)
    dvec = _vec(tape, cx, rv, 0.0, 1.0)

    def f(vec):
        img, fill = r._frame(mat, jnp.float32(0.0), vec, pixel_perfect=False)
        return img

    (img, tang) = jax.jvp(f, (vec,), (dvec,))
    fill = np.asarray(
        r._frame(mat, jnp.float32(0.0), vec, pixel_perfect=False)[1]
    )
    ev = fill == FILL_NONE
    assert ev.any() and (~ev).any()
    tang = np.asarray(tang)
    # evaluated pixels: d/dr = -1; filled pixels carry no distance (the
    # primal is a NaN-boxed fill), so their tangent is 0 or NaN — never
    # a finite nonzero value a caller might mistake for a gradient
    np.testing.assert_allclose(tang[ev], -1.0, rtol=1e-4, atol=1e-4)
    t_fill = tang[~ev]
    assert ((t_fill == 0.0) | ~np.isfinite(t_fill)).all()


def test_unrolled_frame_pixel_gradients_vs_fd(circle):
    """The production tiled-unrolled frame (pixel_perfect) is
    differentiable end-to-end through compaction and scatter."""
    tape, cx, rv = circle
    r = PixelRenderer(tape, ImageSize(N, N), interpret=True)
    key = id(r.tape)
    _register_tape(key, lambda: (
        r.tape, r.packed_b, r.axis_of, r.nf_b, r.cw_b,
    ))
    T0 = 16
    n0x = n0y = N // T0
    n0 = n0x * n0y
    fn = _frame_unrolled_fn(
        key, T0, n0x, n0y, n0, r.n_inputs, True, True
    )
    tx = np.arange(n0x, dtype=np.float32) * T0
    gx, gy = np.meshgrid(tx, tx)
    x0 = jnp.asarray(gx.reshape(-1))
    y0 = jnp.asarray(gy.reshape(-1))
    mat = jnp.asarray(r._mat4(None))

    def f(vec):
        img, fill, na = fn(x0, y0, mat, jnp.float32(0.0), vec)
        return img[:N, :N]

    vec = _vec(tape, cx, rv, 0.1, 0.5)
    _check_jvp_vs_fd(f, vec, _vec(tape, cx, rv, 0.7, -0.3))


def test_fit_step_gradient_vs_fd(circle):
    """fit_step's shard_map/psum reverse-mode gradient must equal the
    central finite difference of the sharded loss."""
    from fidget_tpu.parallel.sharding import fit_step, make_mesh, render_sharded

    tape, cx, rv = circle
    mesh = make_mesh()
    size = ImageSize(N, N)
    target = np.asarray(
        render_sharded(tape, size, mesh, params={cx: 0.25, rv: 0.6})
    )

    theta = {cx: 0.1, rv: 0.5}
    lr = 0.5
    new_params, loss = fit_step(tape, size, mesh, theta, target, lr=lr)
    g = {
        v: (theta[v] - float(new_params[v])) / lr for v in theta
    }

    def loss_at(p):
        d = np.asarray(render_sharded(tape, size, mesh, params=p))
        return float(((d - target) ** 2).mean())

    for v in (cx, rv):
        hi = dict(theta)
        lo = dict(theta)
        hi[v] = theta[v] + H_FD
        lo[v] = theta[v] - H_FD
        fd = (loss_at(hi) - loss_at(lo)) / (2 * H_FD)
        np.testing.assert_allclose(g[v], fd, rtol=2e-2, atol=1e-4)


def test_interp_float_reverse_mode_matches_forward(circle):
    """jax.grad through the Pallas float interpreter (custom JVP's
    transposable Jacobian contraction) must match jacfwd and FD — the
    north-star 'gradients via JAX autodiff through the tape
    evaluator' on the zero-recompile path."""
    tape, cx, rv = circle
    r = PixelRenderer(tape, ImageSize(N, N), interpret=True)
    mat = jnp.asarray(r._mat4(None))

    def loss(vec):
        img, fill = r._frame(mat, jnp.float32(0.0), vec, pixel_perfect=True)
        return jnp.sum(img**2) / (N * N)

    vec = _vec(tape, cx, rv, 0.1, 0.5)
    g_rev = np.asarray(jax.grad(loss)(vec))
    g_fwd = np.asarray(jax.jacfwd(loss)(vec))
    np.testing.assert_allclose(g_rev, g_fwd, rtol=1e-5, atol=1e-6)
    for k in range(len(vec)):
        e = np.zeros(len(vec), np.float32)
        e[k] = 1.0
        fd = (
            float(loss(vec + H_FD * e)) - float(loss(vec - H_FD * e))
        ) / (2 * H_FD)
        np.testing.assert_allclose(g_rev[k], fd, rtol=2e-2, atol=1e-3)


def test_fit_step_interp_matches_unrolled(circle):
    """fit_step(pipeline="interp") — reverse mode through the Pallas
    interpreter under shard_map/psum — must produce the same gradients
    as the unrolled pipeline."""
    from fidget_tpu.parallel.sharding import fit_step, make_mesh, render_sharded

    tape, cx, rv = circle
    mesh = make_mesh()
    size = ImageSize(N, N)
    target = np.asarray(
        render_sharded(tape, size, mesh, params={cx: 0.25, rv: 0.6})
    )
    theta = {cx: 0.1, rv: 0.5}
    p_u, l_u = fit_step(tape, size, mesh, theta, target, lr=0.5)
    p_i, l_i = fit_step(
        tape, size, mesh, theta, target, lr=0.5, pipeline="interp"
    )
    np.testing.assert_allclose(l_i, l_u, rtol=1e-5, atol=1e-7)
    for v in theta:
        np.testing.assert_allclose(
            float(p_i[v]), float(p_u[v]), rtol=1e-4, atol=1e-5
        )
