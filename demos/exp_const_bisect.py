"""Which traced arg makes the bucketed 2D path 4x slower?

Runs the SAME _frame_single_fn body with different subsets of the tape
args passed as jit constants (numpy) vs traced operands (device arrays).
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from fidget_tpu.io.models import load_vm_tape
from fidget_tpu.render.region import ImageSize
from fidget_tpu.render.render2d import PixelRenderer, _frame_single_fn

N, K = 1024, 16

def main():
    tape = load_vm_tape("prospero.vm")
    r = PixelRenderer(tape, ImageSize(N, N), tile_size=64)
    p = r.packed_b
    fn = _frame_single_fn(
        r.T0, r.n0x, r.n0y, r.Lcap_b, r.nf_b, r.n_inputs, r.cw_b,
        False, r.interpret, None, False,
    )
    np_args = dict(
        w1=p.w1, w2=p.w2, imm=p.imm, lens=p.lengths,
        x0=r.tile_x0, y0=r.tile_y0, ai=r.axis_idx,
    )
    dev_args = {k: jnp.asarray(v) for k, v in np_args.items()}
    mat = jnp.asarray(r._mat4(None))
    vec = jnp.zeros(r.n_inputs, jnp.float32)
    zs = jnp.arange(K, dtype=jnp.float32)

    variants = [
        ("all traced", set()),
        ("all const", {"w1", "w2", "imm", "lens", "x0", "y0", "ai"}),
        ("const tape(w1,w2,imm)", {"w1", "w2", "imm"}),
        ("const lens", {"lens"}),
        ("const ai", {"ai"}),
        ("const x0,y0", {"x0", "y0"}),
    ]
    order = ("w1", "w2", "imm", "lens", "x0", "y0", "ai")
    for label, const in variants:
        picked = [np_args[k] if k in const else dev_args[k] for k in order]
        @jax.jit
        def many(mat, zs):
            def body(i, acc):
                img, fill = fn(*picked, mat * (1.0 + zs[i] * 1e-7),
                               jnp.float32(0.0), vec)
                return acc + jnp.sum(img) + jnp.sum(fill.astype(jnp.float32))
            return lax.fori_loop(0, K, body, jnp.float32(0.0))
        float(many(mat, zs))
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            float(many(mat * (1.0 + 1e-5 * (i + 1)), zs))
            best = min(best, (time.perf_counter() - t0) / K)
        print(f"{label:24s}: {best*1e3:7.2f} ms/frame  {N*N/best/1e6:6.1f} Mpix/s")

if __name__ == "__main__":
    main()
