"""TPU benchmark: tiled-unrolled 2D mode on prospero 1024^2.

Follows the honest methodology (bench.py): settle capacity with a real
render, verify occupancy + distances vs brute force, then time K
perturbed frames per dispatch and report the K-slope.

Usage: python demos/exp_unrolled_bench.py [tile] [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from fidget_tpu.io.models import load_vm_tape
from fidget_tpu.render.region import ImageSize
from fidget_tpu.render.render2d import (
    _frame_unrolled_fn,
    PixelRenderer,
)


def main():
    T0 = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    tape = load_vm_tape("prospero.vm")
    r = PixelRenderer(tape, ImageSize(N, N))

    t0 = time.perf_counter()
    img = r.render_unrolled(tile_size=T0)
    t1 = time.perf_counter()
    cap = r._ucap[T0]
    print(f"first render (compile+retries): {t1 - t0:.1f} s, settled cap {cap}")

    brute = r.render_brute()
    ev = img.fill == 0
    ok = np.isclose(img.distance[ev], brute[ev], rtol=1e-5, atol=1e-5)
    both_nan = np.isnan(img.distance[ev]) & np.isnan(brute[ev])
    print(f"distance agreement: {(ok | both_nan).mean() * 100:.3f}%")
    occ = (img.inside() == (brute < 0)).mean()
    print(f"occupancy agreement: {occ * 100:.4f}%  evaluated {ev.mean()*100:.1f}%")
    if occ < 0.9999:
        print("OCCUPANCY GUARD FAILED"); sys.exit(1)

    n0x = -(-N // T0)
    n0y = -(-N // T0)
    key = id(r.tape)
    fn = _frame_unrolled_fn(
        key, T0, n0x, n0y, cap, r.n_inputs, False, r.interpret
    )
    tx = np.arange(n0x) * T0
    ty = np.arange(n0y) * T0
    gx, gy = np.meshgrid(tx, ty)
    x0 = jnp.asarray(gx.reshape(-1).astype(np.float32))
    y0 = jnp.asarray(gy.reshape(-1).astype(np.float32))
    mat = jnp.asarray(r._mat4(None))
    vec = jnp.zeros(r.n_inputs, jnp.float32)

    K = 32

    def many(mat):
        def body(k, acc):
            m = mat * (1.0 + 1e-7 * k.astype(jnp.float32))
            d, f, na = fn(x0, y0, m, jnp.float32(0.0), vec)
            return acc + jnp.sum(d) + na.astype(jnp.float32)

        return lax.fori_loop(0, K, body, jnp.float32(0.0))

    mj = jax.jit(many)
    _ = float(mj(mat))  # compile + warm
    best = float("inf")
    for i in range(4):
        t0 = time.perf_counter()
        _ = float(mj(mat * (1.0 + 1e-6 * (i + 1))))
        best = min(best, (time.perf_counter() - t0) / K)
    ms = best * 1e3
    print(f"best: {ms:.2f} ms/frame = {N * N / best / 1e6:.1f} Mpix/s")


if __name__ == "__main__":
    main()
