"""Slope-corrected stage decomposition of the tiled-unrolled 2D frame.

Where does the 0.91 ms/frame (prospero 1024^2, 8-px tiles) actually
go?  Times the pipeline cut after each stage:

  cull     : root interval pass (unrolled, lanes = tiles)
  compact  : + argsort worklist compaction
  leaf     : + whole-tape unrolled leaf over [C, pp]
  full     : + scatter-back / fill assembly

Each cut is K-frame fori_loop batched with a perturbed transform
(same methodology as bench.py), slope-timed so dispatch latency and
loop overhead cancel.
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
    PixelRenderer,
    _TAPE_REGISTRY,
    _register_tape,
    _unrolled_cull_stage,
    _unrolled_leaf_stage,
)

N = 1024
T0 = int(sys.argv[1]) if len(sys.argv) > 1 else 8


def main():
    tape = load_vm_tape("prospero.vm")
    r = PixelRenderer(tape, ImageSize(N, N))
    img = r.render_unrolled(tile_size=T0)  # sizes capacity + warms leaf
    C = r._ucap[T0]
    n0x = n0y = N // T0
    n0 = n0x * n0y
    pp = T0 * T0
    V = r.n_inputs
    key = id(r.tape)
    print(f"T0={T0} n0={n0} C={C} ({C/n0:.1%} of tiles)")

    tx = np.arange(n0x, dtype=np.float32) * T0
    gx, gy = np.meshgrid(tx, tx)
    x0 = jnp.asarray(gx.reshape(-1))
    y0 = jnp.asarray(gy.reshape(-1))
    mat0 = jnp.asarray(r._mat4(None))
    vec = jnp.zeros(V, jnp.float32)

    def stage_fn(stop):
        def frame(x0, y0, mat, z, var_vec):
            root_in, root_out = _unrolled_cull_stage(
                key, T0, n0, V, x0, y0, mat, z, var_vec, False
            )
            act = ~(root_in | root_out)
            if stop == "cull":
                return (act.sum().astype(jnp.float32),)
            pos = jnp.cumsum(act.astype(jnp.int32)) - 1
            dest = jnp.where(act, pos, C)
            o1 = (
                jnp.zeros(C, jnp.int32)
                .at[dest]
                .set(jnp.arange(n0, dtype=jnp.int32) + 1, mode="drop")
            )
            valid = o1 > 0
            order = jnp.maximum(o1 - 1, 0)
            cx0 = x0[order]
            cy0 = y0[order]
            if stop == "compact":
                return (jnp.sum(cx0) + jnp.sum(cy0)
                        + valid.sum().astype(jnp.float32),)
            dist_c = _unrolled_leaf_stage(
                key, T0, cx0, cy0, valid, mat, z, var_vec
            )
            if stop == "leaf":
                return (jnp.sum(dist_c),)
            slot_of = jnp.where(act & (pos < C), pos, C)
            dist_pad = jnp.concatenate(
                [dist_c, jnp.zeros((1, pp), jnp.float32)], axis=0
            )
            dist = dist_pad[slot_of].reshape(n0y, n0x, T0, T0)
            img = dist.transpose(0, 2, 1, 3).reshape(n0y * T0, n0x * T0)
            return (jnp.sum(img),)
        return frame

    prev = 0.0
    for stop in ("cull", "compact", "leaf", "full"):
        fr = stage_fn(stop)

        def mk(K):
            @jax.jit
            def many(mat):
                def body(k, acc):
                    m = mat * (1.0 + 1e-7 * k.astype(jnp.float32))
                    outs = fr(x0, y0, m, jnp.float32(0.0), vec)
                    return acc + sum(jnp.sum(o) for o in outs)
                return lax.fori_loop(0, K, body, jnp.float32(0.0))
            return many

        def batch(K):
            f = mk(K)
            float(f(mat0))
            best = float("inf")
            for i in range(3):
                m = mat0 * (1.0 + 1e-6 * (i + 1))
                t0 = time.perf_counter()
                float(f(m))
                best = min(best, time.perf_counter() - t0)
            return best

        t_lo, t_hi = batch(16), batch(64)
        slope = (t_hi - t_lo) / 48
        print(f"through {stop:8s}: {slope*1e3:7.3f} ms/frame slope "
              f"(+{(slope-prev)*1e3:.3f})")
        prev = slope


if __name__ == "__main__":
    main()
