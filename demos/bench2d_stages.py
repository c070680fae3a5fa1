"""2D pipeline stage breakdown for prospero 1024^2 (single-level 64).

Times jitted programs that stop after each stage, K frames per
dispatch inside a fori_loop (bench.py methodology), so the ~28 ms
tunnel dispatch latency amortizes away.

CAVEAT: this replica re-derives the stages and measured ~4x slower at
the leaf stage than the production bucketed path (bench.py 185 Mpix/s
= ~5.4 ms/frame); per pipeline_stats the production leaf pass runs
230 tiles x 872 mean simplified steps at ~15 ns/step. Trust bench.py
for absolute numbers; use this only for relative stage shares.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from fidget_tpu.io.models import load_vm_tape
from fidget_tpu.render.region import ImageSize
from fidget_tpu.render.render2d import PixelRenderer

N = 1024
K = 16


def main():
    tape = load_vm_tape("prospero.vm")
    r = PixelRenderer(tape, ImageSize(N, N), tile_size=64)
    print(f"n0={r.n0} s0r={r.s0r} s0l={r.s0l} nf={r.nf} L={len(tape)}")

    from fidget_tpu.eval.arith import IntervalMode
    from fidget_tpu.eval.pallas_interp import interp_float, interp_interval
    from fidget_tpu.eval.simplify_device import DeviceSimplifier

    im = IntervalMode(jnp)
    x0 = jnp.asarray(r.tile_x0)
    y0 = jnp.asarray(r.tile_y0)
    vec = jnp.zeros(r.n_inputs, jnp.float32)

    def stage_fn(stop):
        def frame(mat, z):
            var_lo, var_hi = r._interval_vars(
                im, mat, z, vec, (x0, x0 + r.T0), (y0, y0 + r.T0),
                r.s0r, (1,),
            )
            olo, ohi, choices0 = interp_interval(
                r.packed.w1, r.packed.w2, r.packed.imm, r.packed.lengths,
                var_lo, var_hi, nf=r.nf, n_inputs=r.n_inputs, n_outputs=1,
                s0=r.s0r, c_words=r.c_words, interpret=False,
            )
            rlo = olo[0, 0].reshape(-1)[: r.n0]
            rhi = ohi[0, 0].reshape(-1)[: r.n0]
            root_active = ~((rhi < 0.0) | (rlo > 0.0))
            if stop == "root":
                return jnp.sum(rlo) + jnp.sum(choices0)
            w1s, w2s, imms, lens0, _ = r.simplifier.simplify_packed(
                choices0, n_tiles=r.n0, interpret=False
            )
            lens0a = jnp.where(root_active, lens0, 0)
            if stop == "simplify":
                return (
                    jnp.sum(w1s).astype(jnp.float32) + jnp.sum(lens0a)
                )
            T0 = r.T0
            ii = jnp.arange(T0, dtype=jnp.float32)
            px = x0[:, None, None] + ii[None, None, :]
            py = y0[:, None, None] + ii[None, :, None]
            px = jnp.broadcast_to(px, (r.n0, T0, T0)).reshape(r.n0, r.s0l, 128)
            py = jnp.broadcast_to(py, (r.n0, T0, T0)).reshape(r.n0, r.s0l, 128)
            mx, my, mz = r._transform_points(mat, px, py, z)
            vars_ = jnp.zeros((r.n0, r.n_inputs, r.s0l, 128), jnp.float32)
            for kind, plane in (("x", mx), ("y", my), ("z", mz)):
                idx = r.axis_of.get(kind)
                if idx is not None:
                    vars_ = vars_.at[:, idx].set(
                        jnp.broadcast_to(plane, (r.n0, r.s0l, 128))
                    )
            dist = interp_float(
                w1s, w2s, imms, lens0a, vars_,
                nf=r.nf, n_inputs=r.n_inputs, n_outputs=1, s0=r.s0l,
                interpret=False,
            )[:, 0]
            return jnp.sum(dist)

        @jax.jit
        def many(mat, zs):
            def body(i, acc):
                return acc + frame(mat + zs[i] * 1e-7, zs[i])
            return lax.fori_loop(0, K, body, jnp.float32(0.0))

        return many

    mat = jnp.asarray(r._mat4(None))
    zs = jnp.arange(K, dtype=jnp.float32)
    prev = 0.0
    for stop in ("root", "simplify", "leaf"):
        fn = stage_fn(stop)
        float(fn(mat, zs))  # compile
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            float(fn(mat, zs + K * (i + 1)))
            ts.append(time.perf_counter() - t0)
        per = min(ts) / K
        print(f"through {stop:9s}: {per*1e3:7.2f} ms/frame (+{(per-prev)*1e3:.2f})")
        prev = per


if __name__ == "__main__":
    main()
