"""Time the leaf interp_float alone, fed by each path's real arenas."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from fidget_tpu.eval.pallas_interp import interp_float
from fidget_tpu.eval.simplify_device import DeviceSimplifier, DynamicSimplifier
from fidget_tpu.io.models import load_vm_tape
from fidget_tpu.render.region import ImageSize
from fidget_tpu.render.render2d import PixelRenderer
from fidget_tpu.eval.arith import IntervalMode
from fidget_tpu.eval.pallas_interp import interp_interval

N, K = 1024, 16

def main():
    tape = load_vm_tape("prospero.vm")
    r = PixelRenderer(tape, ImageSize(N, N), tile_size=64)
    im = IntervalMode(jnp)
    mat = jnp.asarray(r._mat4(None))
    vec = jnp.zeros(r.n_inputs, jnp.float32)
    x0 = jnp.asarray(r.tile_x0); y0 = jnp.asarray(r.tile_y0)

    # run the front half once to get real choices
    var_lo, var_hi = r._interval_vars(
        im, mat, jnp.float32(0.0), vec, (x0, x0 + r.T0), (y0, y0 + r.T0),
        r.s0r, (1,))
    olo, ohi, choices0 = interp_interval(
        r.packed.w1, r.packed.w2, r.packed.imm, r.packed.lengths,
        var_lo, var_hi, nf=r.nf, n_inputs=r.n_inputs, n_outputs=1,
        s0=r.s0r, c_words=r.c_words, interpret=False)
    rlo = olo[0, 0].reshape(-1)[:r.n0]
    rhi = ohi[0, 0].reshape(-1)[:r.n0]
    root_active = ~((rhi < 0.0) | (rlo > 0.0))

    # path A arenas: DeviceSimplifier.simplify_packed
    w1a, w2a, imma, lena, _ = r.simplifier.simplify_packed(
        choices0, n_tiles=r.n0, interpret=False)
    lena = jnp.where(root_active, lena, 0)

    # path B arenas: liveness codes + DynamicSimplifier.reconstruct at Lcap
    from fidget_tpu.eval.simplify_device import _liveness_codes
    p = r.packed_b
    Lcap = r.Lcap_b
    perlane = _liveness_codes(
        jnp.asarray(p.w1).reshape(1, 1, Lcap).astype(jnp.int32),
        jnp.asarray(p.w2).reshape(1, 1, Lcap).astype(jnp.int32),
        jnp.asarray(p.lengths).reshape(1, 1, 1).astype(jnp.int32),
        choices0, nf=r.nf, L=Lcap, shared_tape=True, interpret=False)
    B = choices0.shape[0]; lw = -(-Lcap // 16)
    per_tile = jnp.moveaxis(
        perlane.reshape(B, lw, r.s0r * 128), 1, 2
    ).reshape(B * r.s0r * 128, lw)[:r.n0]
    codes_u8 = DeviceSimplifier.unpack_codes(per_tile, Lcap)
    w1p = jnp.broadcast_to(jnp.asarray(p.w1).astype(jnp.int32), (r.n0, Lcap))
    w2p = jnp.broadcast_to(jnp.asarray(p.w2).astype(jnp.int32), (r.n0, Lcap))
    immp = jnp.broadcast_to(jnp.asarray(p.imm), (r.n0, Lcap))
    w1b, w2b, immb, lenb, _ = DynamicSimplifier.reconstruct(
        w1p, w2p, immp, codes_u8)
    lenb = jnp.where(root_active, lenb, 0)

    print("lens equal:", bool((lena == lenb).all()),
          "mean len:", float(lena.mean()))

    # shared leaf vars
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
    vars_ = jax.device_put(vars_)

    def timeit(label, w1x, w2x, immx, lenx, nf):
        d = tuple(jax.device_put(a) for a in (w1x, w2x, immx, lenx))
        @jax.jit
        def many(v, zs):
            def body(i, acc):
                out = interp_float(*d, v + zs[i] * 1e-7,
                                   nf=nf, n_inputs=r.n_inputs, n_outputs=1,
                                   s0=r.s0l, interpret=False)
                return acc + jnp.sum(out)
            return lax.fori_loop(0, K, body, jnp.float32(0.0))
        zs = jnp.arange(K, dtype=jnp.float32)
        float(many(vars_, zs))
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            float(many(vars_, zs + (i + 1)))
            best = min(best, (time.perf_counter() - t0) / K)
        print(f"{label:28s}: {best*1e3:7.2f} ms/leaf")

    timeit("A DeviceSimplifier (W=6461)", w1a, w2a, imma, lena, r.nf)
    timeit("B Dynamic @Lcap (W=8192)", w1b, w2b, immb, lenb, r.nf_b)
    timeit("B arenas, nf=127", w1b, w2b, immb, lenb, r.nf)
    # B arenas truncated to 6461 columns
    timeit("B truncated to 6461", w1b[:, :6461], w2b[:, :6461],
           immb[:, :6461], lenb, r.nf)

if __name__ == "__main__":
    main()
