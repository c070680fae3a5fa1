"""A/B the dispatch-vocabulary truncation on the interp pipeline.

Times the bucketed zero-recompile 2D pipeline (render()) on prospero
1024^2 with the full 31-branch switch vs the tape_n_ops()-truncated
vocabulary (12 for prospero). If the switch lowers to a linear
predicated if-chain (~11 ns/branch/step, demos/exp_position.py),
truncation should cut the interpreter's per-step cost ~2.5x.

Usage: python demos/exp_nops.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from fidget_tpu.io.models import load_vm_tape
from fidget_tpu.render.region import ImageSize
from fidget_tpu.render.render2d import PixelRenderer, _frame_single_fn
from fidget_tpu.eval.pallas_interp import _N_OPS, tape_n_ops

N = 1024
K = 16


def main():
    tape = load_vm_tape("prospero.vm")
    r = PixelRenderer(tape, ImageSize(N, N))
    p = r.packed_b
    args = (
        jnp.asarray(p.w1), jnp.asarray(p.w2), jnp.asarray(p.imm),
        jnp.asarray(p.lengths), jnp.asarray(r.tile_x0),
        jnp.asarray(r.tile_y0), jnp.asarray(r.axis_idx),
        jnp.asarray(r._mat4(None)), jnp.float32(0.0),
        jnp.zeros(r.n_inputs, jnp.float32),
    )
    brute = r.render_brute()
    for n_ops in (_N_OPS, tape_n_ops(tape), 16):
        fn = _frame_single_fn(
            r.T0, r.n0x, r.n0y, r.Lcap_b, r.nf_b, r.n_inputs, r.cw_b,
            False, r.interpret, n_ops=n_ops,
        )
        t0 = time.time()
        img, fill = fn(*args)
        compile_s = time.time() - t0
        img = np.asarray(img)[:N, :N]
        fill = np.asarray(fill)[:N, :N]
        inside = np.where(fill == 0, img < 0, (fill - 1) % 2 + 1 == 1)
        agree = float((inside == (brute < 0)).mean())

        def many(mat):
            def body(k, acc):
                m = mat * (1.0 + 1e-7 * k.astype(jnp.float32))
                d, f = fn(*args[:7], m, args[8], args[9])
                return acc + jnp.sum(d)

            return lax.fori_loop(0, K, body, jnp.float32(0.0))

        f = jax.jit(many)
        _ = float(f(args[7]))
        best = float("inf")
        for i in range(3):
            t0 = time.time()
            _ = float(f(args[7] * (1.0 + 1e-6 * (i + 1))))
            best = min(best, (time.time() - t0) / K)
        print(
            f"n_ops={n_ops:2d}: {best*1e3:7.3f} ms/frame = "
            f"{N*N/best/1e6:6.1f} Mpix/s  occupancy {agree:.6f} "
            f"(compile {compile_s:.0f}s)"
        )


if __name__ == "__main__":
    main()
