"""Isolate the traced-path leaf slowdown: nf and Lcap bucket variants."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from fidget_tpu.compiler.pack import pack_tapes
from fidget_tpu.io.models import load_vm_tape
from fidget_tpu.render.region import ImageSize
from fidget_tpu.render.render2d import PixelRenderer, _frame_single_fn

N, K = 1024, 16

def main():
    tape = load_vm_tape("prospero.vm")
    r = PixelRenderer(tape, ImageSize(N, N), tile_size=64)
    mat = jnp.asarray(r._mat4(None))
    vec = jnp.zeros(r.n_inputs, jnp.float32)
    zs = jnp.arange(K, dtype=jnp.float32)
    for nf_b, Lcap in ((128, 8192), (127, 8192), (136, 8192), (64+63, 8192),
                       (128, 6464), (127, 6464)):
        if nf_b < r.nf:
            continue
        p = pack_tapes([tape], capacity=Lcap)
        a = (jnp.asarray(p.w1), jnp.asarray(p.w2), jnp.asarray(p.imm),
             jnp.asarray(p.lengths), jnp.asarray(r.tile_x0),
             jnp.asarray(r.tile_y0), jnp.asarray(r.axis_idx))
        fn = _frame_single_fn(
            r.T0, r.n0x, r.n0y, Lcap, nf_b, r.n_inputs, r.cw_b,
            False, r.interpret, None, False,
        )
        @jax.jit
        def many(mat, zs):
            def body(i, acc):
                img, fill = fn(*a, mat * (1.0 + zs[i] * 1e-7),
                               jnp.float32(0.0), vec)
                return acc + jnp.sum(img) + jnp.sum(fill.astype(jnp.float32))
            return lax.fori_loop(0, K, body, jnp.float32(0.0))
        float(many(mat, zs))
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            float(many(mat * (1.0 + 1e-5 * (i + 1)), zs))
            best = min(best, (time.perf_counter() - t0) / K)
        print(f"nf={nf_b:3d} Lcap={Lcap}: {best*1e3:7.2f} ms/frame "
              f"{N*N/best/1e6:6.1f} Mpix/s")

if __name__ == "__main__":
    main()
