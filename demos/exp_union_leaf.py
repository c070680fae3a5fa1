"""Measure the union-tape unrolled leaf on hardware (VERDICT r4 #1).

prospero.vm 1024^2, 8-px cull tiles: the full-tape leaf runs 6,461 ops
on every active tile; block-union tapes cut that to a tile-weighted
mean of 1,430 (256-px blocks, 16 programs) or 730 (64-px, 209
programs) — demos/exp_simplify_stats.py. This harness times the
union-leaf frame end-to-end with the bench.py methodology (K-frame
fori_loop, per-frame perturbed transform, checksum forcing) against
the full-leaf frame, plus correctness guards vs brute force.

Usage: python demos/exp_union_leaf.py [block_px ...] [--model M] [--N n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from fidget_tpu.io.models import load_vm_tape
from fidget_tpu.render.region import ImageSize
from fidget_tpu.render.render2d import (
    PixelRenderer,
    _frame_union_fn,
    _frame_unrolled_fn,
    _register_plan,
)

T0 = 8
K = 512


def time_frame(fn, args, n_outputs_to_sum=1):
    """K-frame fori_loop wall time per frame (bench.py methodology)."""

    def many(mat):
        def body(k, acc):
            m = mat * (1.0 + 1e-7 * k.astype(jnp.float32))
            out = fn(args[0], args[1], m, args[3], args[4])
            return acc + jnp.sum(out[0]) + out[2].astype(jnp.float32)

        return lax.fori_loop(0, K, body, jnp.float32(0.0))

    f = jax.jit(many)
    t0 = time.time()
    _ = float(f(args[2]))
    compile_s = time.time() - t0
    best = float("inf")
    for i in range(3):
        t0 = time.time()
        _ = float(f(args[2] * (1.0 + 1e-6 * (i + 1))))
        best = min(best, (time.time() - t0) / K)
    return best, compile_s


def main():
    argv = sys.argv[1:]
    model = "prospero.vm"
    N = 1024
    if "--model" in argv:
        i = argv.index("--model")
        model = argv[i + 1]
        del argv[i : i + 2]
    if "--N" in argv:
        i = argv.index("--N")
        N = int(argv[i + 1])
        del argv[i : i + 2]
    blocks = [int(a) for a in argv] or [256]

    tape = load_vm_tape(model)
    r = PixelRenderer(tape, ImageSize(N, N))
    n0x = n0y = N // T0
    n0 = n0x * n0y
    tx = np.arange(n0x) * T0
    gx, gy = np.meshgrid(tx, tx)
    x0 = jnp.asarray(gx.reshape(-1).astype(np.float32))
    y0 = jnp.asarray(gy.reshape(-1).astype(np.float32))
    mat = jnp.asarray(r._mat4(None))
    vec = jnp.zeros(r.n_inputs, jnp.float32)
    args = (x0, y0, mat, jnp.float32(0.0), vec)
    brute = r.render_brute()

    # full-tape leaf baseline
    t0 = time.time()
    img = r.render_unrolled(tile_size=T0)
    print(f"full leaf first render (compile): {time.time()-t0:.1f}s")
    cap = r._ucap[T0]
    ffn = _frame_unrolled_fn(
        id(r.tape), T0, n0x, n0y, cap, r.n_inputs, False, r.interpret
    )
    best, cs = time_frame(ffn, args)
    print(
        f"full leaf: {best*1e3:.3f} ms/frame = {N*N/best/1e6:.0f} Mpix/s"
        f" (many-compile {cs:.0f}s)"
    )

    for bpx in blocks:
        t0 = time.time()
        img = r.render_unrolled(tile_size=T0, leaf="union", block_px=bpx)
        wall = time.time() - t0
        st = r.union_stats
        agree = float((img.inside() == (brute < 0)).mean())
        ev = img.fill == 0
        ok = np.isclose(img.distance[ev], brute[ev], rtol=1e-5, atol=1e-5)
        ok |= np.isnan(img.distance[ev]) & np.isnan(brute[ev])
        print(
            f"union {bpx}px: first render {wall:.1f}s (plan+compile), "
            f"occupancy {agree:.6f}, dist {ok.mean():.6f}, {st}"
        )
        assert agree > 0.9999 and ok.mean() > 0.9999
        plan = r._uplans[(T0, bpx)]
        fb_cap = max(128, -(-(n0 // 64) // 128) * 128)
        ufn = _frame_union_fn(
            id(r.tape), _register_plan(plan), T0, n0x, n0y, fb_cap,
            r.n_inputs, False, r.interpret,
        )
        best, cs = time_frame(ufn, args)
        print(
            f"union {bpx}px: {best*1e3:.3f} ms/frame = "
            f"{N*N/best/1e6:.0f} Mpix/s (many-compile {cs:.0f}s)"
        )


if __name__ == "__main__":
    main()
