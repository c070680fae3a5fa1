"""Sweep the cull tile size of the tiled-unrolled 2D pipeline on TPU.

Finer cull tiles evaluate fewer pixels (prospero 1024^2: ~34% active at
8 px vs ~51% at 16 px) while the cull itself is lane-parallel and near
free — but capacity, argsort width, and scatter cost all grow with the
tile count. This measures steady-state Mpix/s per tile size with the
bench.py methodology (K frames per dispatch, perturbed transform,
K-slope between two batch sizes to cancel dispatch latency) plus the
occupancy guard per configuration.

Run alone (holds the chip): python demos/exp_unrolled_tiles.py [sizes]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from fidget_tpu.io.models import load_vm_tape
    from fidget_tpu.render.region import ImageSize
    from fidget_tpu.render.render2d import PixelRenderer, _frame_unrolled_fn

    N = 1024
    sizes = [int(a) for a in sys.argv[1:]] or [8, 16, 32]
    tape = load_vm_tape("prospero.vm")
    r = PixelRenderer(tape, ImageSize(N, N))
    brute = r.render_brute()
    occ_brute = (brute < 0).mean()

    for T0 in sizes:
        t_start = time.time()
        img = r.render_unrolled(tile_size=T0)
        t_first = time.time() - t_start
        agree = float((img.inside() == (brute < 0)).mean())
        cap = r._ucap[T0]
        n0x = n0y = N // T0
        print(
            f"tile {T0:3d}: first render {t_first:6.1f}s "
            f"cap={cap}/{n0x * n0y} ({cap / (n0x * n0y):.0%}) "
            f"occupancy agreement {agree:.6f}",
            flush=True,
        )
        if agree < 0.9999:
            print(f"tile {T0}: FAILED occupancy guard"); continue

        fn = _frame_unrolled_fn(
            id(r.tape), T0, n0x, n0y, cap, r.n_inputs, False, r.interpret
        )
        tx = np.arange(n0x) * T0
        gx, gy = np.meshgrid(tx, tx)
        x0 = jnp.asarray(gx.reshape(-1).astype(np.float32))
        y0 = jnp.asarray(gy.reshape(-1).astype(np.float32))
        mat = jnp.asarray(r._mat4(None))
        vec = jnp.zeros(r.n_inputs, jnp.float32)

        def make(K):
            def many(mat):
                def body(k, acc):
                    m = mat * (1.0 + 1e-7 * k.astype(jnp.float32))
                    dist, fill, na = fn(x0, y0, m, jnp.float32(0.0), vec)
                    return acc + jnp.sum(dist) + na.astype(jnp.float32)

                return lax.fori_loop(0, K, body, jnp.float32(0.0))

            return jax.jit(many)

        res = {}
        for K in (4, 16):
            f = make(K)
            _ = float(f(mat))
            best = float("inf")
            for i in range(3):
                t0 = time.time()
                _ = float(f(mat * (1.0 + 1e-6 * (i + 1))))
                best = min(best, time.time() - t0)
            res[K] = best
        ms = (res[16] - res[4]) / 12 * 1e3
        print(
            f"tile {T0:3d}: {ms:6.2f} ms/frame = {N * N / ms / 1e3:7.1f} "
            f"Mpix/s  (K4 {res[4] * 1e3:.1f} ms, K16 {res[16] * 1e3:.1f} ms)",
            flush=True,
        )


if __name__ == "__main__":
    main()
