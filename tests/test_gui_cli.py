"""GUI camera math + CLI tests."""

import math
import pathlib

import numpy as np
import pytest

from fidget_tpu.gui import Canvas2, Canvas3, DragMode, View2, View3
from fidget_tpu.render.region import ImageSize, VoxelSize


def test_view2_transform():
    # mirror of the View2 doctest (fidget-gui/src/lib.rs:30-49)
    v = View2.from_center_and_scale([5.0, 5.0], 1.0)
    np.testing.assert_allclose(v.transform_point([-1.0, 0.0]), [4.0, 5.0])
    np.testing.assert_allclose(v.transform_point([0.0, 1.0]), [5.0, 6.0])
    np.testing.assert_allclose(v.transform_point([0.0, -1.0]), [5.0, 4.0])


def test_view2_zoom_about_point():
    v = View2.from_center_and_scale([0.0, 0.0], 1.0)
    p = [0.5, 0.5]
    before = v.transform_point(p)
    assert v.zoom(2.0, p)
    after = v.transform_point(p)
    np.testing.assert_allclose(before, after, atol=1e-12)
    assert v.scale == 2.0
    assert not v.zoom(1.0)


def test_view2_translate_roundtrip():
    v = View2.from_center_and_scale([0.0, 0.0], 2.0)
    h = v.begin_translate([0.0, 0.0])
    assert v.translate(h, [1.0, 0.0])
    # dragging by +1 world unit moves the center by -scale
    np.testing.assert_allclose(v.center, [-2.0, 0.0])


def test_view3_rotation_and_serde():
    v = View3.from_center_and_scale([0.0, 0.0, 0.0], 1.0)
    h = v.begin_rotate([0.0, 0.0, 0.0])
    assert v.rotate(h, [0.1, 0.2, 0.0])
    assert v.yaw != 0.0 and v.pitch != 0.0
    assert 0.0 <= v.pitch <= math.pi
    d = v.to_dict()
    v2 = View3.from_dict(d)
    np.testing.assert_allclose(v2.world_to_model(), v.world_to_model())


def test_view3_world_to_model_composition():
    v = View3.from_center_and_scale([1.0, 2.0, 3.0], 2.0)
    # scale then translate: origin maps to center
    np.testing.assert_allclose(
        v.transform_point([0.0, 0.0, 0.0]), [1.0, 2.0, 3.0]
    )
    np.testing.assert_allclose(
        v.transform_point([1.0, 0.0, 0.0]), [3.0, 2.0, 3.0]
    )


def test_canvas2_drag():
    c = Canvas2(ImageSize(100, 100))
    c.begin_drag([10, 50])
    assert c.drag([20, 50])
    c.end_drag()
    assert not c.drag([30, 50])
    assert c.view.center[0] != 0.0


def test_canvas3_rotate_drag():
    c = Canvas3(VoxelSize(100, 100, 100))
    c.begin_drag([50, 50], DragMode.ROTATE)
    assert c.drag([60, 40])
    assert c.view.yaw != 0.0


def test_cli_render2d_and_mesh(tmp_path):
    from fidget_tpu.cli import main
    from fidget_tpu.io.models import find_model, has_model

    if not has_model("hi.vm"):
        pytest.skip("model assets unavailable")
    png = tmp_path / "out.png"
    rc = main(
        ["render2d", str(find_model("hi.vm")), "-s", "128",
         "-o", str(png), "--mode", "mono"]
    )
    assert rc == 0
    data = png.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    stl = tmp_path / "out.stl"
    rc = main(
        ["mesh", str(find_model("quarter.vm")), "--depth", "4",
         "-o", str(stl)]
    )
    assert rc == 0
    assert stl.stat().st_size > 84


def test_viewer_watch_once(tmp_path, capsys):
    # one watch iteration: render the model, write the frame, print the
    # ASCII preview, exit 0 (the live-reload loop minus the loop)
    from fidget_tpu.io.models import find_model, has_model
    from fidget_tpu.viewer import watch

    if not has_model("hi.vm"):
        pytest.skip("model assets unavailable")
    out = tmp_path / "frame.png"
    rc = watch(
        str(find_model("hi.vm")), size=64, out=str(out), once=True
    )
    assert rc == 0
    assert out.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"
    assert "@" in capsys.readouterr().out  # ASCII ink was printed


def test_pipeline_stats():
    from fidget_tpu import Context, lower
    from fidget_tpu.render.render2d import PixelRenderer
    from fidget_tpu.utils import pipeline_stats, timed

    ctx = Context()
    x, y = ctx.x(), ctx.y()
    tape = lower(
        ctx, [ctx.sub(ctx.sqrt(ctx.add(ctx.square(x), ctx.square(y))), 0.6)]
    )
    r = PixelRenderer(tape, ImageSize(512, 512), tile_size=64, interpret=True)
    stats = pipeline_stats(r)
    assert stats.n_root == 64
    assert stats.root_inside > 0 and stats.root_outside > 0
    assert stats.root_active + stats.root_inside + stats.root_outside == 64
    assert stats.simplified_max <= len(tape)
    assert "active" in str(stats)
    with timed("x") as t:
        pass
    assert t["seconds"] >= 0


def test_editor_service():
    import threading
    import urllib.request

    from fidget_tpu.serve import serve

    srv = serve(port=0)  # ephemeral port
    port = srv.server_address[1]
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=30
        ).read()
        assert b"fidget_tpu viewer" in page
        script = b"draw(circle(#{ radius: 0.5 }));"
        png = urllib.request.urlopen(
            urllib.request.Request(
                f"http://127.0.0.1:{port}/render?size=64", data=script
            ),
            timeout=120,
        ).read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        # interactive-viewer cameras: a panned/zoomed View2 and a
        # rotated View3 must render through the same endpoints
        png2 = urllib.request.urlopen(
            urllib.request.Request(
                f"http://127.0.0.1:{port}/render?size=64"
                "&mode=2d&view2=0.25,-0.1,0.5",
                data=script,
            ),
            timeout=120,
        ).read()
        assert png2[:8] == b"\x89PNG\r\n\x1a\n" and png2 != png
        png3 = urllib.request.urlopen(
            urllib.request.Request(
                f"http://127.0.0.1:{port}/render?size=64"
                "&mode=3d&view3=0,0,0,1,0.7,0.3",
                data=script,
            ),
            timeout=300,
        ).read()
        assert png3[:8] == b"\x89PNG\r\n\x1a\n"
        # malformed camera -> 400, not a server error
        import urllib.error as _ue
        try:
            urllib.request.urlopen(
                urllib.request.Request(
                    f"http://127.0.0.1:{port}/render?view2=1,2",
                    data=script,
                ),
                timeout=60,
            )
            assert False, "expected HTTPError"
        except _ue.HTTPError as e:
            assert e.code == 400
        tape = urllib.request.urlopen(
            urllib.request.Request(
                f"http://127.0.0.1:{port}/tape", data=script
            ),
            timeout=60,
        ).read()
        # canonical bytecode header
        assert tape[:4] == b"\xff\xff\xff\xff"
        # script errors -> 400 with a message
        import urllib.error

        try:
            urllib.request.urlopen(
                urllib.request.Request(
                    f"http://127.0.0.1:{port}/render", data=b"bogus(("
                ),
                timeout=60,
            )
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.shutdown()


def test_cli_render2d_eval_unrolled(tmp_path):
    """--eval unrolled routes through the union leaf end-to-end."""
    from fidget_tpu.cli import main
    from fidget_tpu.io.models import find_model, has_model

    if not has_model("hi.vm"):
        pytest.skip("model assets unavailable")
    png = tmp_path / "u.png"
    rc = main(
        ["render2d", str(find_model("hi.vm")), "-s", "64",
         "--eval", "unrolled", "--mode", "mono", "-o", str(png)]
    )
    assert rc == 0
    assert png.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"
