"""Leaf pass via interp_float_coded (no tape materialization, no sort)
vs the reconstruct+interp_float production path: correctness + timing."""
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
    args = lambda: (
        jnp.asarray(p.w1), jnp.asarray(p.w2), jnp.asarray(p.imm),
        jnp.asarray(p.lengths), jnp.asarray(r.tile_x0),
        jnp.asarray(r.tile_y0), jnp.asarray(r.axis_idx),
    )
    mat = jnp.asarray(r._mat4(None))
    vec = jnp.zeros(r.n_inputs, jnp.float32)

    imgs = {}
    for coded in (False, True):
        fn = _frame_single_fn(
            r.T0, r.n0x, r.n0y, r.Lcap_b, r.nf_b, r.n_inputs, r.cw_b,
            False, r.interpret, None, coded,
        )
        img, fill = fn(*args(), mat, jnp.float32(0.0), vec)
        imgs[coded] = (np.asarray(img), np.asarray(fill))
    same_fill = (imgs[False][1] == imgs[True][1]).all()
    ev = imgs[False][1] == 0
    close = np.allclose(imgs[False][0][ev], imgs[True][0][ev], rtol=1e-5, atol=1e-5)
    print(f"fill match: {same_fill}, dist allclose: {close}")

    for coded in (False, True):
        fn = _frame_single_fn(
            r.T0, r.n0x, r.n0y, r.Lcap_b, r.nf_b, r.n_inputs, r.cw_b,
            False, r.interpret, None, coded,
        )
        a = args()
        @jax.jit
        def many(mat, zs):
            def body(i, acc):
                img, fill = fn(mat + zs[i] * 1e-7, jnp.float32(0.0), vec)
                return acc + jnp.sum(img) + jnp.sum(fill)
            # close over tape args via partial application
            return lax.fori_loop(0, K, body, jnp.float32(0.0))
        # bind tape args by wrapping
        fnb = lambda m, z: fn(*a, m, z, vec)
        @jax.jit
        def many2(mat, zs):
            def body(i, acc):
                img, fill = fnb(mat + zs[i] * 1e-7, jnp.float32(0.0))
                return acc + jnp.sum(img) + jnp.sum(fill.astype(jnp.float32))
            return lax.fori_loop(0, K, body, jnp.float32(0.0))
        zs = jnp.arange(K, dtype=jnp.float32)
        float(many2(mat, zs))
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            float(many2(mat, zs + K * (i + 1)))
            ts.append(time.perf_counter() - t0)
        per = min(ts) / K
        mpix = N * N / per / 1e6
        print(f"coded={coded}: {per*1e3:.2f} ms/frame  {mpix:.1f} Mpix/s")

if __name__ == "__main__":
    main()
