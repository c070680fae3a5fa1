"""Isolated leaf: which operand perturbation makes it slow?"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from demos.exp_leaf_k import *  # noqa
from fidget_tpu.eval.arith import IntervalMode
from fidget_tpu.eval.pallas_interp import interp_float, interp_interval
from fidget_tpu.io.models import load_vm_tape
from fidget_tpu.render.region import ImageSize
from fidget_tpu.render.render2d import PixelRenderer

N, K = 1024, 16

def setup():
    tape = load_vm_tape("prospero.vm")
    r = PixelRenderer(tape, ImageSize(N, N), tile_size=64)
    im = IntervalMode(jnp)
    mat = jnp.asarray(r._mat4(None))
    vec = jnp.zeros(r.n_inputs, jnp.float32)
    x0 = jnp.asarray(r.tile_x0); y0 = jnp.asarray(r.tile_y0)
    var_lo, var_hi = r._interval_vars(
        im, mat, jnp.float32(0.0), vec, (x0, x0 + r.T0), (y0, y0 + r.T0),
        r.s0r, (1,))
    olo, ohi, ch = interp_interval(
        r.packed.w1, r.packed.w2, r.packed.imm, r.packed.lengths,
        var_lo, var_hi, nf=r.nf, n_inputs=r.n_inputs, n_outputs=1,
        s0=r.s0r, c_words=r.c_words, interpret=False)
    rlo = olo[0, 0].reshape(-1)[:r.n0]; rhi = ohi[0, 0].reshape(-1)[:r.n0]
    act = ~((rhi < 0.0) | (rlo > 0.0))
    w1a, w2a, imma, lena, _ = r.simplifier.simplify_packed(
        ch, n_tiles=r.n0, interpret=False)
    lena = jnp.where(act, lena, 0)
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
    return r, tuple(jax.device_put(a) for a in (w1a, w2a, imma, lena)), \
        jax.device_put(vars_)

def bench(label, mk_many, *a):
    f = jax.jit(mk_many)
    zs = jnp.arange(K, dtype=jnp.float32)
    float(f(*a, zs))
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter(); float(f(*a, zs + (i + 1)))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:28s}: {best/K*1e3:7.2f} ms/leaf")

def main():
    r, d, vars_ = setup()
    w1a, w2a, imma, lena = d
    kw = dict(nf=r.nf, n_inputs=r.n_inputs, n_outputs=1, s0=r.s0l,
              interpret=False)

    def many_varsfull(v, zs):
        def body(i, acc):
            out = interp_float(w1a, w2a, imma, lena, v + zs[i] * 1e-7, **kw)
            return acc + jnp.sum(out)
        return lax.fori_loop(0, K, body, jnp.float32(0.0))

    def many_immperturb(v, zs):
        def body(i, acc):
            out = interp_float(w1a, w2a, imma + zs[i] * 1e-12, lena, v, **kw)
            return acc + jnp.sum(out)
        return lax.fori_loop(0, K, body, jnp.float32(0.0))

    def many_tiny(v, zs):
        def body(i, acc):
            v2 = v.at[:, :, 0, 0].add(zs[i] * 1e-7)
            out = interp_float(w1a, w2a, imma, lena, v2, **kw)
            return acc + jnp.sum(out)
        return lax.fori_loop(0, K, body, jnp.float32(0.0))

    bench("vars full-add perturb", many_varsfull, vars_)
    bench("imm perturb (vars fixed)", many_immperturb, vars_)
    bench("vars tiny-DUS perturb", many_tiny, vars_)

if __name__ == "__main__":
    main()
