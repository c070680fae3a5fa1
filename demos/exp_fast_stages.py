"""Slope-corrected stage timing of the fast constant-tape 2D path."""
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
    x0 = jnp.asarray(r.tile_x0); y0 = jnp.asarray(r.tile_y0)
    base = np.eye(4, dtype=np.float32)
    prev = 0.0
    for stop in ("root", "simplify", "leaf", None):
        def batch_time(K):
            def many(mat, z):
                def body(k, acc):
                    m = mat * (1.0 + 1e-7 * k)
                    mm = jnp.asarray(r._mat4(None)) @ jnp.diag(
                        jnp.ones(4, jnp.float32))  # keep mat math simple
                    outs = r._frame_tiles(
                        m @ jnp.asarray(r._mat4(None)) * 0 + m, z, vec,
                        x0, y0, pixel_perfect=False, stop_after=stop)
                    return acc + sum(
                        jnp.sum(o).astype(jnp.float32) for o in outs)
                return lax.fori_loop(0, K, body, 0.0)
            f = jax.jit(many)
            m0 = jnp.asarray(r._mat4(None))
            z = jnp.float32(0.0)
            float(f(m0, z))
            best = float("inf")
            for i in range(3):
                m = m0 * (1.0 + 1e-5 * (i + 1))
                t0 = time.time(); float(f(m, z))
                best = min(best, time.time() - t0)
            return best
        t4, t16 = batch_time(4), batch_time(16)
        slope = (t16 - t4) / 12
        print(f"through {str(stop):9s}: {slope*1e3:7.2f} ms/frame slope "
              f"(+{(slope-prev)*1e3:.2f})")
        prev = slope

if __name__ == "__main__":
    main()
