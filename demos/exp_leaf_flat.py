"""Leaf layout probe: [C, pp] vs barrier + reshape to [M, 128].

The 4-px tile sweep lost (772 vs 1156 Mpix/s) with the leaf's
[C, 16] layout — 112/128 of each vreg row idle IF XLA pads the minor
dim. A flat [C*pp//128, 128] layout would fix that, but a bitcast
reshape between plane construction and the chain used to break fusion
catastrophically (demos/exp_leaf_bisect.py: one HBM buffer per op).
Here we force the planes to materialize FIRST (optimization_barrier),
so the chain is a fresh full-width fusion cluster.

Times eval_tape_float_fast over the same total pixels in both
layouts, K-slope corrected, for pp in {16, 64}.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from fidget_tpu.eval.unrolled_fast import eval_tape_float_fast
from fidget_tpu.io.models import load_vm_tape


def main():
    tape = load_vm_tape("prospero.vm")
    axis_of = {v.kind: i for v, i in tape.var_map.items()}
    V = max(1, len(tape.var_map))
    rng = np.random.default_rng(0)

    for pp, C in ((16, 16384), (64, 4096)):
        n = C * pp  # 262144 px both ways
        cx0 = jnp.asarray(rng.uniform(-1, 1, C).astype(np.float32))
        cy0 = jnp.asarray(rng.uniform(-1, 1, C).astype(np.float32))
        T0 = int(pp ** 0.5)
        ii = jnp.arange(pp, dtype=jnp.float32)

        def planes(eps):
            px = cx0[:, None] * (1 + eps) + (ii[None, :] % T0) * 2e-3
            py = cy0[:, None] * (1 + eps) + (ii[None, :] // T0) * 2e-3
            return px, py

        def chain(px, py, shape):
            inputs = [jnp.zeros(shape, jnp.float32) for _ in range(V)]
            if "x" in axis_of:
                inputs[axis_of["x"]] = jnp.broadcast_to(px, shape)
            if "y" in axis_of:
                inputs[axis_of["y"]] = jnp.broadcast_to(py, shape)
            return eval_tape_float_fast(tape, inputs)[0]

        def f_tiled(eps):
            px, py = planes(eps)
            return jnp.sum(chain(px, py, (C, pp)))

        def f_flat(eps):
            px, py = planes(eps)
            px, py = lax.optimization_barrier((px, py))
            M = n // 128
            px = px.reshape(M, 128)
            py = py.reshape(M, 128)
            return jnp.sum(chain(px, py, (M, 128)))

        for name, f in (("tiled", f_tiled), ("flat", f_flat)):
            def mk(K):
                @jax.jit
                def many(e0):
                    def body(k, acc):
                        return acc + f(e0 + 1e-7 * k.astype(jnp.float32))
                    return lax.fori_loop(0, K, body, jnp.float32(0.0))
                return many

            def batch(K):
                g = mk(K)
                float(g(jnp.float32(0.0)))
                best = float("inf")
                for i in range(3):
                    t0 = time.perf_counter()
                    float(g(jnp.float32(1e-6 * (i + 1))))
                    best = min(best, time.perf_counter() - t0)
                return best

            t_lo, t_hi = batch(8), batch(32)
            slope = (t_hi - t_lo) / 24
            print(f"pp={pp:3d} {name:5s} [{C}x{pp}]: "
                  f"{slope*1e3:7.3f} ms for {n} px "
                  f"({n/slope/1e6:7.1f} Mpix/s raw)")


if __name__ == "__main__":
    main()
