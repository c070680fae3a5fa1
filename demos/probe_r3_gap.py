"""Decompose the tiled-unrolled 1024^2 prospero frame stage-by-stage.

Round-3 gap hunt: BENCH_r02 measured 117.9 Mpix/s (8.8 ms/frame) while
the round-2 dev session recorded 349-354. This times, with the bench.py
K-slope methodology, each suffix of the frame pipeline:

  cull            : unrolled interval pass -> n_active
  cull+sort       : + argsort compaction
  cull+sort+leaf  : + unrolled leaf over the compacted worklist
  full            : + scatter-back / assemble (== bench.py's fn)
  leaf(fixed)     : leaf alone over a FIXED worklist (no cull/sort)

Run alone (holds the chip): python demos/probe_r3_gap.py [tile]
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
    from fidget_tpu.render.render2d import (
        PixelRenderer,
        _frame_unrolled_fn,
        _unrolled_cull_stage,
        _unrolled_leaf_stage,
    )

    N = 1024
    T0 = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    tape = load_vm_tape("prospero.vm")
    r = PixelRenderer(tape, ImageSize(N, N))
    img = r.render_unrolled(tile_size=T0)
    cap = r._ucap[T0]
    n0x = n0y = N // T0
    n0 = n0x * n0y
    key = id(r.tape)
    print(f"tile={T0} cap={cap}/{n0} ({cap/n0:.0%})", flush=True)

    tx = np.arange(n0x) * T0
    gx, gy = np.meshgrid(tx, tx)
    x0 = jnp.asarray(gx.reshape(-1).astype(np.float32))
    y0 = jnp.asarray(gy.reshape(-1).astype(np.float32))
    mat = jnp.asarray(r._mat4(None))
    vec = jnp.zeros(r.n_inputs, jnp.float32)
    V = r.n_inputs
    C = cap

    def stage_cull(m):
        ri, ro = _unrolled_cull_stage(
            key, T0, n0, V, x0, y0, m, jnp.float32(0.0), vec, False
        )
        return (~(ri | ro)).sum().astype(jnp.float32)

    def stage_cull_sort(m):
        ri, ro = _unrolled_cull_stage(
            key, T0, n0, V, x0, y0, m, jnp.float32(0.0), vec, False
        )
        act = ~(ri | ro)
        order = jnp.argsort(~act, stable=True)[:C]
        return x0[order].sum() + y0[order].sum() + act.sum().astype(
            jnp.float32
        )

    def stage_cull_sort_leaf(m):
        ri, ro = _unrolled_cull_stage(
            key, T0, n0, V, x0, y0, m, jnp.float32(0.0), vec, False
        )
        act = ~(ri | ro)
        order = jnp.argsort(~act, stable=True)[:C]
        valid = act[order]
        dist_c = _unrolled_leaf_stage(
            key, T0, x0[order], y0[order], valid, m, jnp.float32(0.0), vec
        )
        return dist_c.sum()

    # fixed worklist: first render's active tiles, no cull/sort in loop
    fr = _frame_unrolled_fn(key, T0, n0x, n0y, cap, V, False, False)
    _, _, na0 = fr(x0, y0, mat, jnp.float32(0.0), vec)
    ri, ro = jax.jit(
        lambda m: _unrolled_cull_stage(
            key, T0, n0, V, x0, y0, m, jnp.float32(0.0), vec, False
        )
    )(mat)
    act = np.asarray(~(ri | ro))
    order = np.argsort(~act, kind="stable")[:C]
    fx0 = jnp.asarray(np.asarray(x0)[order])
    fy0 = jnp.asarray(np.asarray(y0)[order])
    fvalid = jnp.asarray(act[order])
    print(f"n_active={int(na0)}", flush=True)

    def stage_leaf_fixed(m):
        dist_c = _unrolled_leaf_stage(
            key, T0, fx0, fy0, fvalid, m, jnp.float32(0.0), vec
        )
        return dist_c.sum()

    def stage_full(m):
        d, f, na = fr(x0, y0, m, jnp.float32(0.0), vec)
        return d.sum() + na.astype(jnp.float32)

    def timeit(name, fn):
        def make(K):
            def many(mat):
                def body(k, acc):
                    m = mat * (1.0 + 1e-7 * k.astype(jnp.float32))
                    return acc + fn(m)

                return lax.fori_loop(0, K, body, jnp.float32(0.0))

            return jax.jit(many)

        res = {}
        for K in (4, 16):
            f = make(K)
            _ = float(f(mat))
            best = float("inf")
            for i in range(3):
                t0 = time.perf_counter()
                _ = float(f(mat * (1.0 + 1e-6 * (i + 1))))
                best = min(best, time.perf_counter() - t0)
            res[K] = best
        ms = (res[16] - res[4]) / 12 * 1e3
        print(
            f"{name:16s}: {ms:7.3f} ms/frame "
            f"({N * N / ms / 1e3:7.1f} Mpix/s equiv)",
            flush=True,
        )
        return ms

    timeit("cull", stage_cull)
    timeit("cull+sort", stage_cull_sort)
    timeit("cull+sort+leaf", stage_cull_sort_leaf)
    timeit("leaf(fixed)", stage_leaf_fixed)
    timeit("full", stage_full)


if __name__ == "__main__":
    main()
