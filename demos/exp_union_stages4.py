"""Stage bisect of the PRODUCTION v4 union frame via stop_after.

Times _frame_union_fn's own compiled prefixes (no probe re-derivation
drift): cull+viol -> +compact -> +scatter -> +leaf -> full, at K=256,
plus the full-leaf frame for reference.

Usage: python demos/exp_union_stages4.py [block_px]
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
N = 1024
K = 256


def main():
    bpx = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    tape = load_vm_tape("prospero.vm")
    r = PixelRenderer(tape, ImageSize(N, N))
    r.render_unrolled(tile_size=T0, leaf="union", block_px=bpx)
    plan = r._uplans[(T0, bpx)]
    key = id(r.tape)
    n0x = N // T0
    n0 = n0x * n0x
    tx = np.arange(n0x) * T0
    gx, gy = np.meshgrid(tx, tx)
    x0 = jnp.asarray(gx.reshape(-1).astype(np.float32))
    y0 = jnp.asarray(gy.reshape(-1).astype(np.float32))
    mat0 = jnp.asarray(r._mat4(None))
    vec = jnp.zeros(r.n_inputs, jnp.float32)
    z = jnp.float32(0.0)
    fb_cap = max(128, -(-(n0 // 64) // 128) * 128)

    def timeit(fn):
        def many(mat):
            def b(k, acc):
                m = mat * (1.0 + 1e-7 * k.astype(jnp.float32))
                out = fn(x0, y0, m, z, vec)
                return acc + sum(
                    jnp.sum(o).astype(jnp.float32) for o in out
                )

            return lax.fori_loop(0, K, b, jnp.float32(0.0))

        f = jax.jit(many)
        _ = float(f(mat0))
        best = float("inf")
        for i in range(3):
            t0 = time.time()
            _ = float(f(mat0 * (1.0 + 1e-6 * (i + 1))))
            best = min(best, (time.time() - t0) / K)
        return best * 1e3

    for stop in ("cull", "compact", "scatter", "leaf", None):
        fn = _frame_union_fn(
            key, _register_plan(plan), T0, n0x, n0x, fb_cap,
            r.n_inputs, False, False, stop,
        )
        print(f"{stop or 'frame':8s}: {timeit(fn):.3f} ms")

    r.render_unrolled(tile_size=T0)
    ffn = _frame_unrolled_fn(
        key, T0, n0x, n0x, r._ucap[T0], r.n_inputs, False, False
    )
    print(f"full    : {timeit(ffn):.3f} ms")


if __name__ == "__main__":
    main()
