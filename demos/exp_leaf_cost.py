"""Compare XLA cost_analysis of the real worklist leaf vs a plain
unrolled chain over the same number of lanes — is the 8.6x gap
(8.3 ms vs 0.97 ms for 655k lanes) extra bytes (fusion splits), extra
flops, or neither (a scheduling artifact)?

Pure compile-side: needs the chip only for constant upload.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from fidget_tpu.eval.unrolled_fast import eval_tape_float_fast
    from fidget_tpu.io.models import load_vm_tape
    from fidget_tpu.render.region import ImageSize
    from fidget_tpu.render.render2d import (
        PixelRenderer,
        _register_tape,
        _unrolled_leaf_stage,
    )

    tape = load_vm_tape("prospero.vm")
    N, T0 = 1024, 16
    r = PixelRenderer(tape, ImageSize(N, N))
    key = id(r.tape)
    _register_tape(key, lambda: (
        r.tape, r.packed_b, r.axis_of, r.nf_b, r.cw_b,
    ))
    C, pp = 2560, T0 * T0
    n = C * pp
    V = r.n_inputs
    ax = r.axis_of
    mat = jnp.asarray(r._mat4(None))
    vec = jnp.zeros(V, jnp.float32)
    rng = np.random.default_rng(0)
    cx0 = jnp.asarray(
        rng.integers(0, N // T0, size=C).astype(np.float32) * T0
    )
    cy0 = jnp.asarray(
        rng.integers(0, N // T0, size=C).astype(np.float32) * T0
    )
    valid = jnp.asarray(np.ones(C, bool))

    K = 8

    def leaf_many(mat):
        def body(k, acc):
            m = mat * (1.0 + 1e-7 * k.astype(jnp.float32))
            d = _unrolled_leaf_stage(
                key, T0, cx0, cy0, valid, m, jnp.float32(0.0), vec
            )
            return acc + d.sum()

        return lax.fori_loop(0, K, body, jnp.float32(0.0))

    xs = jnp.asarray(rng.uniform(-1, 1, size=n).astype(np.float32))
    ys = jnp.asarray(rng.uniform(-1, 1, size=n).astype(np.float32))

    def plain_many(xs, ys):
        def body(k, acc):
            eps = 1e-7 * k.astype(jnp.float32)
            inputs = [jnp.zeros((n,), jnp.float32)] * V
            if "x" in ax:
                inputs[ax["x"]] = xs + eps
            if "y" in ax:
                inputs[ax["y"]] = ys + eps
            return acc + eval_tape_float_fast(tape, inputs)[0].sum()

        return lax.fori_loop(0, K, body, jnp.float32(0.0))

    for name, fn, args in (
        ("leaf", leaf_many, (mat,)),
        ("plain", plain_many, (xs, ys)),
    ):
        c = jax.jit(fn).lower(*args).compile()
        ca = c.cost_analysis()
        flops = ca.get("flops", float("nan"))
        bytes_ = ca.get("bytes accessed", float("nan"))
        print(
            f"{name:6s}: flops {flops/1e9:8.2f} G   bytes {bytes_/1e9:8.3f} GB"
            f"   (per frame: {flops/K/1e9:.2f} G, {bytes_/K/1e6:.1f} MB)",
            flush=True,
        )
        mem = c.memory_analysis()
        print(
            f"        temp {mem.temp_size_in_bytes/1e6:.1f} MB  "
            f"argument {mem.argument_size_in_bytes/1e6:.1f} MB",
            flush=True,
        )


if __name__ == "__main__":
    main()
