"""Measure the packed-lane unrolled leaf on prospero 1024^2.

At pp = T0^2 < 128 the leaf used to evaluate [C, pp] planes, wasting
(128-pp)/128 of every vreg (50% at the 8-px default). The packed leaf
folds K = 128//pp worklist slots into each 128-lane row, so leaf
arithmetic tracks active PIXELS. This sweeps tile sizes with the
bench.py methodology (K-frame fori_loop batches, per-frame transform
perturbation, occupancy guard, slope timing) and prints one JSON line
per tile size.

Usage: python demos/exp_packed_leaf.py [tilesizes...]  (default 8 4 16)
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from fidget_tpu.io.models import load_vm_tape
from fidget_tpu.render.region import ImageSize
from fidget_tpu.render.render2d import PixelRenderer, _frame_unrolled_fn

N = 1024


def measure(r, brute, T):
    img = r.render_unrolled(tile_size=T)
    agree = float((img.inside() == (brute < 0)).mean())
    assert agree > 0.9999, f"occupancy {agree}"
    cap = r._ucap[T]
    n0x = n0y = N // T
    fn = _frame_unrolled_fn(
        id(r.tape), T, n0x, n0y, cap, r.n_inputs, False, r.interpret
    )
    tx = np.arange(n0x) * T
    gx, gy = np.meshgrid(tx, tx)
    x0 = jnp.asarray(gx.reshape(-1).astype(np.float32))
    y0 = jnp.asarray(gy.reshape(-1).astype(np.float32))
    mat = jnp.asarray(r._mat4(None))
    vec = jnp.zeros(r.n_inputs, jnp.float32)
    d0, f0, na0 = fn(x0, y0, mat, jnp.float32(0.0), vec)
    d0, f0 = np.asarray(d0)[:N, :N], np.asarray(f0)[:N, :N]
    inside0 = np.where(f0 == 0, d0 < 0, (f0 - 1) % 2 + 1 == 1)
    assert abs(inside0.mean() - (brute < 0).mean()) < 1e-4, "timed-path occ"
    assert int(na0) <= cap, "capacity"

    def batch(K):
        def many(mat):
            def body(k, acc):
                m = mat * (1.0 + 1e-7 * k.astype(jnp.float32))
                dist, fill, na = fn(x0, y0, m, jnp.float32(0.0), vec)
                return acc + jnp.sum(dist) + na.astype(jnp.float32)
            return lax.fori_loop(0, K, body, jnp.float32(0.0))
        f = jax.jit(many, static_argnums=())
        _ = float(f(mat))
        best = float("inf")
        for i in range(3):
            t0 = time.time()
            _ = float(f(mat * (1.0 + 1e-6 * (i + 1))))
            best = min(best, time.time() - t0)
        return best

    t4, t16 = batch(4), batch(16)
    slope = (t16 - t4) / 12.0
    wall = batch(128) / 128.0
    return {
        "tile": T, "cap": cap, "active": int(na0),
        "slope_ms": round(slope * 1e3, 3),
        "slope_mpix_s": round(N * N / slope / 1e6, 1),
        "wall128_mpix_s": round(N * N / wall / 1e6, 1),
    }


def main():
    tiles = [int(a) for a in sys.argv[1:]] or [8, 4, 16]
    tape = load_vm_tape("prospero.vm")
    r = PixelRenderer(tape, ImageSize(N, N))
    brute = r.render_brute()
    for T in tiles:
        t0 = time.time()
        res = measure(r, brute, T)
        res["setup_s"] = round(time.time() - t0, 1)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
