"""Array-layout sweep for the unrolled leaf: same op chain, same
element count, different logical shapes. The worklist leaf currently
evaluates [C*pp] 1D lanes; dense evaluates [1024,1024] 2D — and the
dense path is 2.5x faster PER PIXEL (5.3 ms / 1M px vs 8.3 ms /
655k px). This isolates whether XLA's fusion tiling is shape-sensitive.

Run alone (holds the chip): python demos/exp_leaf_layout.py
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

    from fidget_tpu.eval.unrolled_fast import eval_tape_float_fast
    from fidget_tpu.io.models import load_vm_tape

    tape = load_vm_tape("prospero.vm")
    ax = {v.kind: i for v, i in tape.var_map.items()}
    V = max(1, len(tape.var_map))
    C, pp = 2560, 256
    n = C * pp
    shapes = [
        (n,),
        (C, pp),
        (n // 128, 128),
        (n // 512, 512),
        (n // 1024, 1024),
        (512, 1280),
    ]
    rng = np.random.default_rng(0)
    base = rng.uniform(-1, 1, size=(2, n)).astype(np.float32)

    for shp in shapes:
        xs = jnp.asarray(base[0].reshape(shp))
        ys = jnp.asarray(base[1].reshape(shp))

        def frame(xs, ys, eps):
            inputs = [jnp.zeros(shp, jnp.float32)] * V
            if "x" in ax:
                inputs[ax["x"]] = xs + eps
            if "y" in ax:
                inputs[ax["y"]] = ys + eps
            return eval_tape_float_fast(tape, inputs)[0].sum()

        def make(K):
            def many(xs, ys):
                def body(k, acc):
                    return acc + frame(xs, ys, 1e-7 * k.astype(jnp.float32))

                return lax.fori_loop(0, K, body, jnp.float32(0.0))

            return jax.jit(many)

        res = {}
        t0 = time.time()
        for K in (4, 16):
            f = make(K)
            _ = float(f(xs, ys))
            best = float("inf")
            for i in range(3):
                t = time.perf_counter()
                _ = float(f(xs + 1e-6 * (i + 1), ys))
                best = min(best, time.perf_counter() - t)
            res[K] = best
        ms = (res[16] - res[4]) / 12 * 1e3
        print(
            f"shape {str(shp):14s}: {ms:7.3f} ms = "
            f"{n / ms / 1e3:7.1f} Mpix/s equiv  "
            f"(setup {time.time() - t0:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
