"""Property-style fuzzing: random expression graphs through the full
tiled pipelines must match the dense brute-force oracle (the strongest
check on culling + device simplification correctness). Seeds are fixed
for determinism."""

import numpy as np
import pytest

from fidget_tpu import Context, lower
from fidget_tpu.render.region import ImageSize, VoxelSize
from fidget_tpu.render.render2d import FILL_NONE, PixelRenderer
from fidget_tpu.render.render3d import VoxelRenderer


def random_tape(seed: int, n_ops: int = 40, dims: int = 2, with_var=False):
    """A random bounded-magnitude SDF-ish expression."""
    rng = np.random.RandomState(seed)
    ctx = Context()
    pool = [ctx.x(), ctx.y()] + ([ctx.z()] if dims == 3 else [])
    # seed with a few primitives so min/max have structure
    for _ in range(3):
        cx, cy = rng.uniform(-0.8, 0.8, 2)
        r = rng.uniform(0.2, 0.9)
        d = ctx.sub(
            ctx.sqrt(
                ctx.add(
                    ctx.square(ctx.sub(ctx.x(), cx)),
                    ctx.square(ctx.sub(ctx.y(), cy)),
                )
            ),
            r,
        )
        pool.append(d)
    unary = ["neg", "abs", "sin", "cos", "sqrt_abs", "square_s"]
    binary = ["add_s", "sub_s", "mul_s", "min", "max", "mod_c"]
    for _ in range(n_ops):
        if rng.rand() < 0.4:
            op = unary[rng.randint(len(unary))]
            a = pool[rng.randint(len(pool))]
            if op == "neg":
                n = ctx.neg(a)
            elif op == "abs":
                n = ctx.abs(a)
            elif op == "sin":
                n = ctx.sin(a)
            elif op == "cos":
                n = ctx.cos(a)
            elif op == "sqrt_abs":
                n = ctx.sqrt(ctx.abs(a))
            else:  # square, rescaled to stay bounded
                n = ctx.mul(0.5, ctx.square(ctx.min(ctx.max(a, -2.0), 2.0)))
        else:
            op = binary[rng.randint(len(binary))]
            a = pool[rng.randint(len(pool))]
            b = pool[rng.randint(len(pool))]
            if op == "add_s":
                n = ctx.mul(0.5, ctx.add(a, b))
            elif op == "sub_s":
                n = ctx.mul(0.5, ctx.sub(a, b))
            elif op == "mul_s":
                n = ctx.mul(
                    0.25,
                    ctx.mul(
                        ctx.min(ctx.max(a, -2.0), 2.0),
                        ctx.min(ctx.max(b, -2.0), 2.0),
                    ),
                )
            elif op == "min":
                n = ctx.min(a, b)
            elif op == "max":
                n = ctx.max(a, b)
            else:
                n = ctx.modulo(a, ctx.add(ctx.abs(b), 0.5))
        pool.append(n)
    root = ctx.sub(pool[-1], 0.1)
    if with_var:
        # blend in a bounded custom-var term so var binding paths are
        # exercised: root + 0.2 * sin(v)
        from fidget_tpu import Var

        v = Var.new()
        root = ctx.add(root, ctx.mul(0.2, ctx.sin(ctx.input(v))))
        return lower(ctx, [root]), v
    return lower(ctx, [root])


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_2d_matches_brute(seed):
    tape = random_tape(seed, dims=2)
    # seed 1 fuzzes the two-level path (a per-shape compile each);
    # every other seed rides the shared single-level bucketed frame
    sizes = (64, 16) if seed == 1 else (32,)
    r = PixelRenderer(
        tape, ImageSize(128, 128), tile_sizes=sizes, interpret=True
    )
    img = r.render()
    brute = r.render_brute()
    ev = img.fill == FILL_NONE
    both_nan = np.isnan(img.distance) & np.isnan(brute)
    close = np.isclose(img.distance, brute, rtol=1e-4, atol=1e-5)
    assert (close | both_nan)[ev].all()
    # fills are conservative truths (NaN counts as not-inside),
    # whichever cull level proved them (fill_class strips level tags)
    cls = img.fill_class()
    inside_f = cls == 1
    outside_f = cls == 2
    assert (brute[inside_f] < 0).all()
    assert ~(brute[outside_f] < 0).any()
    # level tags are consistent: single-level renders only tag level 0
    lvl = img.fill_level()
    assert lvl.max() <= (len(sizes) - 1)
    assert (lvl[img.fill == 0] == -1).all()


@pytest.mark.parametrize("seed", (0, 3))
def test_fuzz_unrolled_matches_brute(seed):
    """The tiled-unrolled pipeline's cull (eval_tape_interval_fast,
    documented NaN relaxation) must stay SOUND on random tapes: fills
    are conservative truths and occupancy matches brute exactly."""
    tape = random_tape(seed, dims=2)
    r = PixelRenderer(tape, ImageSize(128, 128), interpret=True)
    brute = r.render_brute()
    img = r.render_unrolled(tile_size=16)
    both_nan = np.isnan(img.distance) & np.isnan(brute)
    ev = img.fill == FILL_NONE
    close = np.isclose(img.distance, brute, rtol=1e-4, atol=1e-5)
    assert (close | both_nan)[ev].all()
    cls = img.fill_class()
    assert (brute[cls == 1] < 0).all()
    assert ~(brute[cls == 2] < 0).any()
    np.testing.assert_array_equal(img.inside(), brute < 0)


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_3d_depth_matches_brute(seed):
    tape = random_tape(100 + seed, dims=3)
    # specialize=False: all seeds share one bucketed (16, 8) frame
    r = VoxelRenderer(
        tape, VoxelSize(32, 32, 32), tile_size=16, sub_size=8,
        interpret=True, specialize=False,
    )
    img = r.render(mode="heightmap", max_retries=6)
    brute = r.render_brute()
    np.testing.assert_array_equal(img.depth, brute.depth)
