"""Fidget-JIT analog: unrolled XLA evaluation of the full tape over the
dense 1024^2 image (no interpreter, no switch). Slope-timed."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from fidget_tpu.eval.arith import FloatMode
from fidget_tpu.eval.unrolled import eval_tape
from fidget_tpu.io.models import load_vm_tape
from fidget_tpu.render.region import ImageSize
from fidget_tpu.render.render2d import PixelRenderer

N = 1024

def main():
    tape = load_vm_tape("prospero.vm")
    r = PixelRenderer(tape, ImageSize(N, N), tile_size=128)
    mat = jnp.asarray(r._mat4(None))
    fm = FloatMode(jnp)
    ax = r.axis_of

    def frame(mat):
        cols = jnp.tile(jnp.arange(N, dtype=jnp.float32), (N,)).reshape(N, N)
        rows = jnp.repeat(jnp.arange(N, dtype=jnp.float32), N).reshape(N, N)
        mx, my, mz = r._transform_points(mat, cols, rows, jnp.float32(0.0))
        inputs = [None] * r.n_inputs
        for kind, plane in (("x", mx), ("y", my), ("z", mz)):
            i = ax.get(kind)
            if i is not None:
                inputs[i] = plane
        for i in range(r.n_inputs):
            if inputs[i] is None:
                inputs[i] = jnp.zeros((N, N), jnp.float32)
        (d,), _ = eval_tape(tape, fm, inputs)
        return d

    def mk(K):
        @jax.jit
        def many(mat, zs):
            def body(k, acc):
                d = frame(mat * (1.0 + zs[k] * 1e-7))
                return acc + jnp.sum(d)
            return lax.fori_loop(0, K, body, jnp.float32(0.0))
        return many

    # correctness vs brute
    t0 = time.time()
    d = np.asarray(jax.jit(frame)(mat))
    print(f"first frame (incl compile): {time.time()-t0:.1f}s")
    brute = r.render_brute()
    print("allclose vs brute:", np.allclose(d, brute, rtol=1e-5, atol=1e-5),
          "occupancy match:", ((d < 0) == (brute < 0)).mean())

    zs4 = jnp.arange(4, dtype=jnp.float32)
    zs16 = jnp.arange(16, dtype=jnp.float32)
    f4, f16 = mk(4), mk(16)
    float(f4(mat, zs4)); float(f16(mat, zs16))
    def best(f, zs):
        b = float("inf")
        for i in range(3):
            t0 = time.perf_counter(); float(f(mat * (1.0 + 1e-5*(i+1)), zs))
            b = min(b, time.perf_counter() - t0)
        return b
    t4, t16 = best(f4, zs4), best(f16, zs16)
    slope = (t16 - t4) / 12
    print(f"dense unrolled: {slope*1e3:.2f} ms/frame  {N*N/slope/1e6:.1f} Mpix/s")

if __name__ == "__main__":
    main()
