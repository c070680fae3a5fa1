"""ASCII-art golden-image tests on the bundled models, mirroring the
reference's strategy (fidget/tests/pixel_render.rs:40-107): render at a
small size and compare occupancy against an embedded golden, printing a
diff on mismatch."""

import numpy as np
import pytest

from fidget_tpu.io.models import has_model, load_vm_tape
from fidget_tpu.render.region import ImageSize
from fidget_tpu.render.render2d import PixelRenderer

HI_32 = [
    ".................X..............",
    ".................X..............",
    ".................X..............",
    ".................X..........XX..",
    ".................X..........XX..",
    ".................X..............",
    ".................X..............",
    ".................XXXXXX.....XX..",
    ".................XXX..XX....XX..",
    ".................XX....XX...XX..",
    ".................X......X...XX..",
    ".................X......X...XX..",
    ".................X......X...XX..",
    ".................X......X...XX..",
    ".................X......X...XX..",
] + ["." * 32] * 17

QUARTER_32 = ["." * 32] * 16 + [
    ".....XXXXXXXXXXX................",
    ".....XXXXXXXXXXX................",
    "......XXXXXXXXXX................",
    "......XXXXXXXXXX................",
    "......XXXXXXXXXX................",
    ".......XXXXXXXXX................",
    "........XXXXXXXX................",
    ".........XXXXXXX................",
    "..........XXXXXX................",
    "...........XXXXX................",
    "..............XX................",
] + ["." * 32] * 5


def _check(name, golden, tile_sizes):
    tape = load_vm_tape(name)
    r = PixelRenderer(
        tape, ImageSize(32, 32), tile_sizes=tile_sizes, interpret=True
    )
    occ = r.render().inside()
    got = ["".join("X" if v else "." for v in row) for row in occ]
    if got != golden:
        diff = "\n".join(
            f"{g}   {e}   {'<<<' if g != e else ''}"
            for g, e in zip(got, golden)
        )
        pytest.fail(f"golden mismatch for {name} (got / expected):\n{diff}")


@pytest.mark.skipif(not has_model("hi.vm"), reason="models unavailable")
@pytest.mark.parametrize("tile_sizes", [(32, 16), (16,), (32,)])
def test_hi_golden(tile_sizes):
    _check("hi.vm", HI_32, tile_sizes)


@pytest.mark.skipif(not has_model("quarter.vm"), reason="models unavailable")
@pytest.mark.parametrize("tile_sizes", [(32, 16), (16,)])
def test_quarter_golden(tile_sizes):
    _check("quarter.vm", QUARTER_32, tile_sizes)


@pytest.mark.skipif(not has_model("hi.vm"), reason="models unavailable")
def test_hi_golden_python_compiler():
    # same golden through the pure-Python lowering path
    from fidget_tpu import Context, lower
    from fidget_tpu.io.models import find_model

    ctx, root = Context.from_text(find_model("hi.vm").read_text())
    tape = lower(ctx, [root])
    r = PixelRenderer(tape, ImageSize(32, 32), tile_size=16, interpret=True)
    occ = r.render().inside()
    got = ["".join("X" if v else "." for v in row) for row in occ]
    assert got == HI_32
