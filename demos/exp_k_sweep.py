"""ms/frame vs frames-per-batch K for the full 2D pipeline."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from fidget_tpu.io.models import load_vm_tape
from fidget_tpu.render.region import ImageSize
from fidget_tpu.render.render2d import PixelRenderer

N = 1024

def main():
    tape = load_vm_tape("prospero.vm")
    r = PixelRenderer(tape, ImageSize(N, N), tile_size=64)
    vec = jnp.zeros(r.n_inputs, jnp.float32)
    for K in (1, 4, 16, 64):
        def many(mat, z):
            def body(k, acc):
                m = mat * (1.0 + 1e-7 * k)
                dist, fill = r._frame_impl(m, z, vec, pixel_perfect=False)
                return acc + jnp.sum(dist) + jnp.sum(fill.astype(jnp.float32))
            return lax.fori_loop(0, K, body, 0.0)
        f = jax.jit(many)
        base = np.eye(4, dtype=np.float32)
        z = jnp.float32(0.0)
        float(f(jnp.asarray(base), z))
        best = float("inf")
        for i in range(3):
            m = base * (1.0 + 1e-5 * (i + 1))
            t0 = time.time(); float(f(jnp.asarray(m), z))
            best = min(best, (time.time() - t0))
        print(f"K={K:4d}: batch {best*1e3:8.2f} ms  -> {best/K*1e3:7.2f} ms/frame")

if __name__ == "__main__":
    main()
