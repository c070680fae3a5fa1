"""Is bench.py's number real or a dispatch-cache artifact?

Times the SAME jitted batch three ways:
A. bench.py exact: 3 timed calls with identical (mat, z)
B. each timed call gets a different mat (cache cannot hit)
C. additive perturbation variant (exp_coded_leaf harness)
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from fidget_tpu.io.models import load_vm_tape
from fidget_tpu.render.region import ImageSize
from fidget_tpu.render.render2d import PixelRenderer

N, K = 1024, 32

def main():
    tape = load_vm_tape("prospero.vm")
    r = PixelRenderer(tape, ImageSize(N, N), tile_size=64)
    vec = jnp.zeros(r.n_inputs, jnp.float32)

    def many(mat, z):
        def body(k, acc):
            m = mat * (1.0 + 1e-7 * k)
            dist, fill = r._frame_impl(m, z, vec, pixel_perfect=False)
            return acc + jnp.sum(dist) + jnp.sum(fill.astype(jnp.float32))
        return lax.fori_loop(0, K, body, 0.0)

    f = jax.jit(many)
    base = np.eye(4, dtype=np.float32)
    z = jnp.float32(0.0)
    float(f(jnp.asarray(base), z))  # compile + warm

    # A: identical repeats (bench.py exact)
    best = float("inf")
    for _ in range(3):
        t0 = time.time(); float(f(jnp.asarray(base), z))
        best = min(best, (time.time() - t0) / K)
    print(f"A identical-batch: {best*1e3:6.2f} ms/frame  {N*N/best/1e6:6.1f} Mpix/s")

    # B: distinct mat per timed call
    best = float("inf")
    for i in range(3):
        m = base * (1.0 + 1e-5 * (i + 1))
        t0 = time.time(); float(f(jnp.asarray(m), z))
        best = min(best, (time.time() - t0) / K)
    print(f"B distinct-batch:  {best*1e3:6.2f} ms/frame  {N*N/best/1e6:6.1f} Mpix/s")

    # C: distinct additive mat per timed call
    best = float("inf")
    for i in range(3):
        m = base + 1e-6 * (i + 1)
        t0 = time.time(); float(f(jnp.asarray(m), z))
        best = min(best, (time.time() - t0) / K)
    print(f"C additive:        {best*1e3:6.2f} ms/frame  {N*N/best/1e6:6.1f} Mpix/s")

if __name__ == "__main__":
    main()
