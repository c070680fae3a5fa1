"""Bisect WHY the worklist leaf's op chain un-fuses (916 MB temps,
8.3 ms) while the plain chain fuses fully (0.1 MB, 0.97 ms).

Variants (cost_analysis only; fast):
  v0 current   : px/py -> transform -> broadcast -> reshape 1D -> chain
  v1 2d        : same but chain evaluated at [C, pp] (no reshape)
  v2 no-where  : v0 without the trailing where(valid)
  v3 no-bcast  : inputs reshaped straight from transform (no
                 broadcast_to)
  v4 barrier   : v0 with optimization_barrier on the chain inputs
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from fidget_tpu.eval.unrolled_fast import eval_tape_float_fast
    from fidget_tpu.io.models import load_vm_tape
    from fidget_tpu.render.region import ImageSize
    from fidget_tpu.render.render2d import PixelRenderer
    from fidget_tpu.render.transform import transform_points

    tape = load_vm_tape("prospero.vm")
    N, T0 = 1024, 16
    r = PixelRenderer(tape, ImageSize(N, N))
    C, pp = 2560, T0 * T0
    n = C * pp
    V = r.n_inputs
    ax = r.axis_of
    mat = jnp.asarray(r._mat4(None))
    vec = jnp.zeros(V, jnp.float32)
    rng = np.random.default_rng(0)
    cx0 = jnp.asarray(rng.integers(0, N // T0, size=C).astype(np.float32) * T0)
    cy0 = jnp.asarray(rng.integers(0, N // T0, size=C).astype(np.float32) * T0)
    valid = jnp.asarray(np.ones(C, bool))
    K = 8

    def build_xy(m, z):
        ii = jnp.arange(pp, dtype=jnp.float32)
        px = cx0[:, None] + ii[None, :] % T0
        py = cy0[:, None] + ii[None, :] // T0
        return transform_points(m, px, py, z)

    def chain(inputs, shape):
        full = [jnp.broadcast_to(vec[i], shape) for i in range(V)]
        for kind, plane in inputs.items():
            idx = ax.get(kind)
            if idx is not None:
                full[idx] = plane
        return eval_tape_float_fast(tape, full)[0]

    def v0(m, z):
        mx, my, mz = build_xy(m, z)
        ins = {
            k: jnp.broadcast_to(p, (C, pp)).reshape(n)
            for k, p in (("x", mx), ("y", my), ("z", mz))
        }
        out = chain(ins, (n,))
        return jnp.where(valid[:, None], out.reshape(C, pp), 0.0)

    def v1(m, z):
        mx, my, mz = build_xy(m, z)
        ins = {
            k: jnp.broadcast_to(p, (C, pp))
            for k, p in (("x", mx), ("y", my), ("z", mz))
        }
        out = chain(ins, (C, pp))
        return jnp.where(valid[:, None], out, 0.0)

    def v2(m, z):
        mx, my, mz = build_xy(m, z)
        ins = {
            k: jnp.broadcast_to(p, (C, pp)).reshape(n)
            for k, p in (("x", mx), ("y", my), ("z", mz))
        }
        return chain(ins, (n,))

    def v3(m, z):
        mx, my, mz = build_xy(m, z)
        ins = {
            k: p.reshape(n)
            for k, p in (("x", mx), ("y", my), ("z", mz))
            if hasattr(p, "reshape") and p.size == n
        }
        out = chain(ins, (n,))
        return jnp.where(valid[:, None], out.reshape(C, pp), 0.0)

    def v4(m, z):
        mx, my, mz = build_xy(m, z)
        ins = {
            k: lax.optimization_barrier(
                jnp.broadcast_to(p, (C, pp)).reshape(n)
            )
            for k, p in (("x", mx), ("y", my), ("z", mz))
        }
        out = chain(ins, (n,))
        return jnp.where(valid[:, None], out.reshape(C, pp), 0.0)

    import time

    for name, v in (("v0 current", v0), ("v1 2d", v1), ("v2 no-where", v2),
                    ("v3 no-bcast", v3), ("v4 barrier", v4)):

        def many(mat):
            def body(k, acc):
                m = mat * (1.0 + 1e-7 * k.astype(jnp.float32))
                return acc + v(m, jnp.float32(0.0)).sum()

            return lax.fori_loop(0, K, body, jnp.float32(0.0))

        c = jax.jit(many).lower(mat).compile()
        ca = c.cost_analysis()
        mem = c.memory_analysis()
        print(
            f"{name:12s}: bytes/frame "
            f"{ca.get('bytes accessed', 0)/K/1e6:8.1f} MB  "
            f"temp {mem.temp_size_in_bytes/1e6:7.1f} MB",
            flush=True,
        )
        # steady-state (only if it fused well or to confirm slowness)
        fjit = jax.jit(many)
        _ = float(fjit(mat))
        best = float("inf")
        for i in range(2):
            t0 = time.perf_counter()
            _ = float(fjit(mat * (1.0 + 1e-6 * (i + 1))))
            best = min(best, time.perf_counter() - t0)
        print(f"{'':12s}  {best / K * 1e3:7.3f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
