"""Stage timing of the bucketed traced-tape 2D path (production render())."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from fidget_tpu.io.models import load_vm_tape
from fidget_tpu.render.region import ImageSize
from fidget_tpu.render.render2d import PixelRenderer, _frame_single_fn

N, K = 1024, 32

def main():
    tape = load_vm_tape("prospero.vm")
    r = PixelRenderer(tape, ImageSize(N, N), tile_size=64)
    p = r.packed_b
    a = (jnp.asarray(p.w1), jnp.asarray(p.w2), jnp.asarray(p.imm),
         jnp.asarray(p.lengths), jnp.asarray(r.tile_x0),
         jnp.asarray(r.tile_y0), jnp.asarray(r.axis_idx))
    mat = jnp.asarray(r._mat4(None))
    vec = jnp.zeros(r.n_inputs, jnp.float32)
    zs = jnp.arange(K, dtype=jnp.float32)
    prev = 0.0
    for stop in ("root", "codes", "simplify", None):
        fn = _frame_single_fn(
            r.T0, r.n0x, r.n0y, r.Lcap_b, r.nf_b, r.n_inputs, r.cw_b,
            False, r.interpret, stop, False,
        )
        @jax.jit
        def many(mat, zs):
            def body(i, acc):
                outs = fn(*a, mat * (1.0 + zs[i] * 1e-7), jnp.float32(0.0), vec)
                return acc + sum(jnp.sum(o).astype(jnp.float32) for o in outs)
            return lax.fori_loop(0, K, body, jnp.float32(0.0))
        float(many(mat, zs))
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            float(many(mat * (1.0 + 1e-5 * (i + 1)), zs))
            best = min(best, (time.perf_counter() - t0) / K)
        print(f"through {str(stop):9s}: {best*1e3:7.2f} ms/frame (+{(best-prev)*1e3:.2f})")
        prev = best

if __name__ == "__main__":
    main()
