"""Post-effects tests (semantics from fidget-raster/src/effects.rs)."""

import numpy as np

from fidget_tpu import Context, lower
from fidget_tpu.render.effects import (
    apply_shading,
    blur_ssao,
    compute_ssao,
    denoise_normals,
    ssao_kernel,
)
from fidget_tpu.render.region import VoxelSize
from fidget_tpu.render.render3d import VoxelRenderer


_SPHERE_IMAGE = None


def _sphere_image(n=64):
    # one shared render (the input is identical for every consumer);
    # specialize=False shares the suite-wide bucketed (32, 8) frame
    global _SPHERE_IMAGE
    if _SPHERE_IMAGE is None:
        ctx = Context()
        x, y, z = ctx.x(), ctx.y(), ctx.z()
        r2 = ctx.add(ctx.square(x), ctx.add(ctx.square(y), ctx.square(z)))
        tape = lower(ctx, [ctx.sub(ctx.sqrt(r2), 0.6)])
        r = VoxelRenderer(
            tape, VoxelSize(n, n, n), tile_size=32, sub_size=8,
            interpret=True, specialize=False,
        )
        _SPHERE_IMAGE = r.render(mode="normals")
    return _SPHERE_IMAGE


def test_ssao_kernel_properties():
    k = ssao_kernel(64)
    norms = np.linalg.norm(k, axis=1)
    assert (norms <= 1.0 + 1e-6).all() and (norms >= 0.1 - 1e-6).all()
    assert (k[:, 2] >= 0).all()  # hemisphere
    # scale grows with index
    assert norms[-1] > norms[0]


def test_flat_plane_unoccluded():
    # a flat z-plane heightmap: SSAO should be ~1 away from edges
    n = 64
    depth = np.full((n, n), 32, np.int32)
    normal = np.broadcast_to([0.0, 0.0, 1.0], (n, n, 3)).astype(np.float32)
    s = np.asarray(compute_ssao(depth, normal, vdepth=n))
    interior = s[16:-16, 16:-16]
    assert np.nanmin(interior) > 0.85, np.nanmin(interior)


def test_ssao_nan_on_empty_and_blur_preserves_nan():
    img = _sphere_image()
    s = np.asarray(compute_ssao(img.depth, img.normal, vdepth=64))
    assert np.isnan(s[img.depth == 0]).all()
    assert np.isfinite(s[img.depth > 0]).all()
    b = np.asarray(blur_ssao(s))
    assert np.isnan(b[img.depth == 0]).all()
    assert np.isfinite(b[img.depth > 0]).all()
    assert (b[img.depth > 0] >= 0).all() and (b[img.depth > 0] <= 1).all()


def test_denoise_replaces_backfacing():
    img = _sphere_image()
    normal = np.array(img.normal)
    ys, xs = np.nonzero(img.depth)
    cy, cx = ys[len(ys) // 2], xs[len(xs) // 2]
    normal[cy, cx] = [0.0, 0.0, -1.0]  # inject a back-facing normal
    out = np.asarray(denoise_normals(img.depth, normal))
    assert out[cy, cx, 2] > 0.0  # replaced by forward-facing average
    # forward-facing normals unchanged
    keep = (img.depth > 0) & (normal[..., 2] > 0)
    np.testing.assert_allclose(out[keep], normal[keep])
    # empty pixels stay zero
    np.testing.assert_allclose(out[img.depth == 0], 0.0)


def test_shading_output():
    img = _sphere_image()
    rgb = apply_shading(img.depth, img.normal, vdepth=64)
    assert rgb.dtype == np.uint8 and rgb.shape == (64, 64, 3)
    assert (rgb[img.depth == 0] == 0).all()
    assert rgb[img.depth > 0].max() > 100  # lit somewhere
    rgb2 = apply_shading(img.depth, img.normal, vdepth=64, ssao=True)
    # SSAO only darkens or keeps
    assert (
        rgb2[img.depth > 0].astype(int) <= rgb[img.depth > 0].astype(int) + 1
    ).all()
