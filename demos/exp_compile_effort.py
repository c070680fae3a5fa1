"""Measure XLA compile-effort dials on the unrolled-leaf compile.

The tiled-unrolled pipeline pays a per-shape XLA:TPU compile (~44 s
cold for prospero's 7,867-op tape). jax 0.9 exposes per-jit
`compiler_options` effort dials (exec_time_optimization_effort,
memory_fitting_effort in [-1, 1], default 0). This measures, per dial
setting: cold compile wall time (via .lower().compile(), persistent
cache disabled) and steady-state frame throughput (K-slope method per
the bench.py methodology).

Run on TPU: python demos/exp_compile_effort.py
"""

import os
import sys
import time

os.environ["FIDGET_TPU_NO_CACHE"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from fidget_tpu.io.models import load_vm_tape
    from fidget_tpu.render.region import ImageSize
    from fidget_tpu.render.render2d import (
        PixelRenderer, _frame_unrolled_fn, _cull_unrolled_fn, _ceil_to,
        _register_tape,
    )

    N = 1024
    TILE = 16
    tape = load_vm_tape("prospero.vm")
    r = PixelRenderer(tape, ImageSize(N, N))
    # size the worklist via the cheap cull dispatch ONLY — a full
    # render_unrolled here would compile the exact production HLO and
    # the remote compile service caches identical programs, making the
    # "default" row's cold-compile read 0.0 s
    n0x = n0y = N // TILE
    n0 = n0x * n0y
    _register_tape(id(r.tape), lambda: (
        r.tape, r.packed_b, r.axis_of, r.nf_b, r.cw_b,
    ))
    tx0 = np.arange(n0x) * TILE
    gx0, gy0 = np.meshgrid(tx0, tx0)
    cf = _cull_unrolled_fn(id(r.tape), TILE, n0x, n0y, r.n_inputs,
                           r.interpret)
    n_act = int(cf(
        jnp.asarray(gx0.reshape(-1).astype(np.float32)),
        jnp.asarray(gy0.reshape(-1).astype(np.float32)),
        jnp.asarray(r._mat4(None)), jnp.float32(0.0),
        jnp.zeros(r.n_inputs, jnp.float32),
    ))
    q = max(128, -(-n0 // 8))
    cap = min(_ceil_to(max(n_act, 1), q), n0)
    r._ucap = getattr(r, "_ucap", {})
    r._ucap[TILE] = cap
    print(f"cap={cap} n0={n0}", flush=True)

    def raw_for(cull):
        return _frame_unrolled_fn(
            id(r.tape), TILE, n0x, n0y, cap, r.n_inputs, False,
            r.interpret, cull,
        ).__wrapped__

    tx = np.arange(n0x) * TILE
    gx, gy = np.meshgrid(tx, tx)
    x0 = jnp.asarray(gx.reshape(-1).astype(np.float32))
    y0 = jnp.asarray(gy.reshape(-1).astype(np.float32))
    mat = jnp.asarray(r._mat4(None))
    vec = jnp.zeros(r.n_inputs, jnp.float32)

    configs = [
        ("default", None, "unrolled"),
        ("exec=-0.5", {"exec_time_optimization_effort": -0.5}, "unrolled"),
        ("exec=-1.0", {"exec_time_optimization_effort": -1.0}, "unrolled"),
        ("exec=-1,mem=-1", {"exec_time_optimization_effort": -1.0,
                            "memory_fitting_effort": -1.0}, "unrolled"),
        # interpreter cull: ~1/3 the program (interval arithmetic is
        # the bulk of the unrolled op count)
        ("interp-cull", None, "interp"),
        ("interp-cull,exec=-1",
         {"exec_time_optimization_effort": -1.0}, "interp"),
    ]
    K = 16
    for name, opts, cull in configs:
        fn = jax.jit(raw_for(cull), compiler_options=opts)
        t0 = time.time()
        lowered = fn.lower(x0, y0, mat, jnp.float32(0.0), vec)
        t1 = time.time()
        compiled = lowered.compile()
        t2 = time.time()

        raw = raw_for(cull)

        def many(mat, k0):
            def body(k, acc):
                m = mat * (1.0 + 1e-7 * (k + k0).astype(jnp.float32))
                # call the RAW frame: compiler_options may only be set
                # on the top-level jit, not on a nested one
                dist, fill, na = raw(x0, y0, m, jnp.float32(0.0), vec)
                return acc + jnp.sum(dist) + na.astype(jnp.float32)

            return lax.fori_loop(0, K, body, jnp.float32(0.0))

        f = jax.jit(many, compiler_options=opts)
        _ = float(f(mat, jnp.float32(0.0)))  # compile+warm (2nd compile!)
        best = float("inf")
        for i in range(3):
            t = time.time()
            _ = float(f(mat, jnp.float32(100.0 + i)))
            best = min(best, (time.time() - t) / K)
        mpix = N * N / best / 1e6
        print(
            f"{name:16s} trace {t1 - t0:6.1f}s  compile {t2 - t1:6.1f}s  "
            f"steady {best * 1e3:6.2f} ms/frame = {mpix:7.1f} Mpix/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
