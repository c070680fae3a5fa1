"""Measure Pallas grid-step fixed overhead on TPU.

The 3D voxel pass is believed to be grid-step-overhead bound (~2 us per
grid instance, cap instances per frame). This times a minimal kernel —
one [8, 128] block in, trivial op, one block out — across grid sizes;
the slope of time vs T is the per-step overhead. A second variant runs
the same total work with G blocks batched per grid step (grid=T/G) to
see how much of the overhead amortizes, which is the cheap alternative
to a manual emit_pipeline/DMA rework.

Run alone (holds the chip): python demos/exp_grid_overhead.py
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
    from jax.experimental import pallas as pl

    def build(T, G, s0=8, reps=8):
        def kernel(x_ref, o_ref):
            v = x_ref[...]
            for _ in range(reps):  # a little VPU work per step
                v = v * 1.0001 + 0.5
            o_ref[...] = v

        fn = pl.pallas_call(
            kernel,
            grid=(T // G,),
            in_specs=[pl.BlockSpec((G, s0, 128), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((G, s0, 128), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((T, s0, 128), jnp.float32),
        )

        K = 64

        def many(x):
            def body(k, acc):
                y = fn(x * (1.0 + 1e-7 * k.astype(jnp.float32)))
                return acc + y[0, 0, 0]

            return lax.fori_loop(0, K, body, jnp.float32(0.0))

        return jax.jit(many), K

    for T in (1024, 4096, 16384):
        for G in (1, 4, 16):
            x = jnp.ones((T, 8, 128), jnp.float32)
            f, K = build(T, G)
            _ = float(f(x))
            best = float("inf")
            for i in range(3):
                t0 = time.time()
                _ = float(f(x * (1.0 + 1e-6 * (i + 1))))
                best = min(best, (time.time() - t0) / K)
            per_step = best / (T // G) * 1e6
            print(
                f"T={T:6d} G={G:3d}: {best * 1e3:7.3f} ms/call "
                f"= {per_step:6.2f} us/grid-step",
                flush=True,
            )


if __name__ == "__main__":
    main()
