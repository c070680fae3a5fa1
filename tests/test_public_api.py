"""Top-level package surface: a reference user should find everything
under `import fidget_tpu` (renderers, mesher, script engine, solver,
sizes, cancellation) without knowing the module layout."""

import numpy as np

import fidget_tpu as ft


def test_lazy_exports_resolve():
    for name in ft._LAZY:
        assert getattr(ft, name) is not None, name
    assert "PixelRenderer" in dir(ft)


def test_top_level_one_liners():
    ctx = ft.Context()
    x, y = ctx.x(), ctx.y()
    t2 = ft.lower(
        ctx, [ctx.sub(ctx.sqrt(ctx.add(ctx.square(x), ctx.square(y))), 0.6)]
    )
    # suite-standard geometry/buckets so this test shares compiled
    # frames with test_fuzz (128^2 @ tile 32, Lcap-64 bucket)
    r = ft.PixelRenderer(
        t2, ft.ImageSize(128, 128), tile_size=32, interpret=True
    )
    img = r.render()
    assert (img.inside() == (r.render_brute() < 0)).all()

    ctx3 = ft.Context()
    x, y, z = ctx3.x(), ctx3.y(), ctx3.z()
    t3 = ft.lower(
        ctx3,
        [ctx3.sub(
            ctx3.sqrt(
                ctx3.add(ctx3.square(x), ctx3.add(ctx3.square(y), ctx3.square(z)))
            ),
            0.6,
        )],
    )
    im3 = ft.render3d(
        t3, ft.VoxelSize(32, 32, 32), tile_size=16, sub_size=8,
        interpret=True, specialize=False,
    )
    assert np.asarray(im3.depth).max() > 0
    m = ft.build_mesh(t3, ft.MeshSettings(depth=3, interpret=True))
    assert len(m.triangles) > 0
