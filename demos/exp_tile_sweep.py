"""HONEST tile-size sweep for the 2D pipeline (correct transform,
slope-corrected, occupancy-guarded)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from fidget_tpu.io.models import load_vm_tape
from fidget_tpu.render.region import ImageSize
from fidget_tpu.render.render2d import PixelRenderer

N = 1024

def measure(r, label):
    vec = jnp.zeros(r.n_inputs, jnp.float32)
    mat = jnp.asarray(r._mat4(None))
    z = jnp.float32(0.0)
    # occupancy guard on the timed path
    img, fill = r._frame(mat, z, vec, pixel_perfect=False)
    occ = np.where(np.asarray(fill) == 0, np.asarray(img) < 0,
                   np.asarray(fill) == 1).mean()

    def batch(K):
        def many(mat, z):
            def body(k, acc):
                m = mat * (1.0 + 1e-7 * k)
                dist, fl = r._frame_impl(m, z, vec, pixel_perfect=False)
                return acc + jnp.sum(dist) + jnp.sum(fl.astype(jnp.float32))
            return lax.fori_loop(0, K, body, 0.0)
        f = jax.jit(many)
        float(f(mat, z))
        best = float("inf")
        for i in range(3):
            m = mat * (1.0 + 1e-5 * (i + 1))
            t0 = time.time(); float(f(m, z))
            best = min(best, time.time() - t0)
        return best
    t4, t16 = batch(4), batch(16)
    slope = (t16 - t4) / 12
    print(f"{label:16s}: {slope*1e3:7.2f} ms/frame  {N*N/slope/1e6:6.1f} "
          f"Mpix/s  (occ {occ:.3f})")

def main():
    tape = load_vm_tape("prospero.vm")
    for ts in (32, 64, 128):
        r = PixelRenderer(tape, ImageSize(N, N), tile_size=ts)
        measure(r, f"single-{ts}")
    for tss in ((128, 32), (128, 64)):
        r = PixelRenderer(tape, ImageSize(N, N), tile_sizes=tss)
        measure(r, f"two-level {tss}")

if __name__ == "__main__":
    main()
