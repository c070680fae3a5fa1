"""Measure assembly (scatter-back + tile->row-major relayout) variants.

The unrolled frames end with `dist_pad[slot_of]` ([n0, 64] gather) and
a [n0y, n0x, T0, T0] -> [H, W] transpose; the union stage bisect put
assembly at ~0.17 ms of the ~0.9 ms frame. Variants over a fixed
worklist (K-loop, checksum-forced):

  a) production: gather + 4D transpose + reshape
  b) row gather: per-image-row gather of [T0]-pixel runs
  c) flat 1M element gather with a precomputed index image
  d) tile-major (no relayout) — the floor

Usage: python demos/exp_assembly.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

N = 1024
T0 = 8
K = 256
n0x = N // T0
n0 = n0x * n0x
C = 6368


def timeit(f, x):
    _ = float(f(x))
    best = float("inf")
    for i in range(3):
        t0 = time.time()
        _ = float(f(x * (1.0 + 1e-6 * (i + 1))))
        best = min(best, (time.time() - t0) / K)
    return best * 1e3


def kloop(body):
    def many(x):
        def b(k, acc):
            return acc + body(x * (1.0 + 1e-7 * k.astype(jnp.float32)))

        return lax.fori_loop(0, K, b, jnp.float32(0.0))

    return jax.jit(many)


def main():
    rng = np.random.default_rng(0)
    dist_c = jnp.asarray(rng.normal(size=(C + 1, T0 * T0)).astype(np.float32))
    slot_np = rng.integers(0, C, n0).astype(np.int32)
    slot_np[rng.random(n0) > 0.4] = C
    slot = jnp.asarray(slot_np)

    def a_body(x):
        dist = (dist_c * x[0, 0])[slot].reshape(n0x, n0x, T0, T0)
        img = dist.transpose(0, 2, 1, 3).reshape(N, N)
        return jnp.sum(img)

    # b) per-row gather: [H, n0x] tile slots + within-tile row
    rowslot_np = np.repeat(slot_np.reshape(n0x, n0x), T0, axis=0)
    py_np = np.broadcast_to(
        (np.arange(N) % T0)[:, None], (N, n0x)
    ).astype(np.int32)
    rowslot = jnp.asarray(rowslot_np)
    pyy = jnp.asarray(py_np)

    def b_body(x):
        d = (dist_c * x[0, 0]).reshape(C + 1, T0, T0)
        img = d[rowslot, pyy]  # [N, n0x, T0]
        return jnp.sum(img.reshape(N, N))

    # c) flat element gather
    Y, X = np.mgrid[0:N, 0:N]
    flat_np = (
        slot_np.reshape(n0x, n0x)[Y // T0, X // T0] * (T0 * T0)
        + (Y % T0) * T0 + (X % T0)
    ).astype(np.int32)
    flat = jnp.asarray(flat_np)

    def c_body(x):
        img = (dist_c * x[0, 0]).reshape(-1)[flat]
        return jnp.sum(img)

    def d_body(x):
        return jnp.sum((dist_c * x[0, 0])[slot])

    for name, body in (
        ("a gather+transpose", a_body),
        ("b row gather", b_body),
        ("c flat gather", c_body),
        ("d tile-major floor", d_body),
    ):
        ms = timeit(kloop(body), jnp.ones((1, 1), jnp.float32))
        print(f"{name}: {ms:.3f} ms")


if __name__ == "__main__":
    main()
