"""K-sweep of the isolated leaf interp_float (slope = true cost/frame)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from fidget_tpu.eval.arith import IntervalMode
from fidget_tpu.eval.pallas_interp import interp_float, interp_interval
from fidget_tpu.io.models import load_vm_tape
from fidget_tpu.render.region import ImageSize
from fidget_tpu.render.render2d import PixelRenderer

N = 1024

def main():
    tape = load_vm_tape("prospero.vm")
    r = PixelRenderer(tape, ImageSize(N, N), tile_size=64)
    im = IntervalMode(jnp)
    mat = jnp.asarray(r._mat4(None))
    vec = jnp.zeros(r.n_inputs, jnp.float32)
    x0 = jnp.asarray(r.tile_x0); y0 = jnp.asarray(r.tile_y0)
    var_lo, var_hi = r._interval_vars(
        im, mat, jnp.float32(0.0), vec, (x0, x0 + r.T0), (y0, y0 + r.T0),
        r.s0r, (1,))
    olo, ohi, choices0 = interp_interval(
        r.packed.w1, r.packed.w2, r.packed.imm, r.packed.lengths,
        var_lo, var_hi, nf=r.nf, n_inputs=r.n_inputs, n_outputs=1,
        s0=r.s0r, c_words=r.c_words, interpret=False)
    rlo = olo[0, 0].reshape(-1)[:r.n0]; rhi = ohi[0, 0].reshape(-1)[:r.n0]
    root_active = ~((rhi < 0.0) | (rlo > 0.0))
    w1a, w2a, imma, lena, _ = r.simplifier.simplify_packed(
        choices0, n_tiles=r.n0, interpret=False)
    lena = jnp.where(root_active, lena, 0)
    T0 = r.T0
    ii = jnp.arange(T0, dtype=jnp.float32)
    px = jnp.broadcast_to(x0[:, None, None] + ii[None, None, :],
                          (r.n0, T0, T0)).reshape(r.n0, r.s0l, 128)
    py = jnp.broadcast_to(y0[:, None, None] + ii[None, :, None],
                          (r.n0, T0, T0)).reshape(r.n0, r.s0l, 128)
    mx, my, mz = r._transform_points(mat, px, py, jnp.float32(0.0))
    vars_ = jnp.zeros((r.n0, r.n_inputs, r.s0l, 128), jnp.float32)
    for kind, plane in (("x", mx), ("y", my), ("z", mz)):
        idx = r.axis_of.get(kind)
        if idx is not None:
            vars_ = vars_.at[:, idx].set(
                jnp.broadcast_to(plane, (r.n0, r.s0l, 128)))
    d = tuple(jax.device_put(a) for a in (w1a, w2a, imma, lena))
    vars_ = jax.device_put(vars_)
    for K in (1, 4, 16):
        @jax.jit
        def many(v, zs):
            def body(i, acc):
                out = interp_float(*d, v + zs[i] * 1e-7,
                                   nf=r.nf, n_inputs=r.n_inputs, n_outputs=1,
                                   s0=r.s0l, interpret=False)
                return acc + jnp.sum(out)
            return lax.fori_loop(0, K, body, jnp.float32(0.0))
        zs = jnp.arange(K, dtype=jnp.float32)
        float(many(vars_, zs))
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            float(many(vars_, zs + (i + 1)))
            best = min(best, time.perf_counter() - t0)
        print(f"K={K:3d}: batch {best*1e3:8.2f} ms -> {best/K*1e3:7.2f} ms/leaf")

if __name__ == "__main__":
    main()
