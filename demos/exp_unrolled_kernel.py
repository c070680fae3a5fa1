"""Probe: straight-line (unrolled-tape) Pallas kernel feasibility.

Question 1: how long does Mosaic take to compile a kernel whose body is
the whole prospero tape (7,867 ops) unrolled as straight-line vector
code? (The XLA dense unroll takes ~4 min; fidget's machine-code JIT
takes microseconds. VERDICT round-1 wants < 30 s.)

Question 2: what's the steady-state throughput vs the 198 Mpix/s XLA
dense unroll and the 109 Mpix/s interpreter pipeline?

Usage: python demos/exp_unrolled_kernel.py [prefix_len] [tile]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fidget_tpu.compiler.tape import Tape
from fidget_tpu.eval.arith import FloatMode
from fidget_tpu.eval.softmath import kernel_namespace
from fidget_tpu.eval.unrolled import eval_tape
from fidget_tpu.io.models import load_vm_tape


def prefix_tape(tape: Tape, n: int) -> Tape:
    """First n rows as a standalone tape (output = last row's out reg)."""
    import dataclasses

    if n >= len(tape):
        return tape
    t = dataclasses.replace(
        tape,
        op=tape.op[:n].copy(), out=tape.out[:n].copy(),
        a=tape.a[:n].copy(), b=tape.b[:n].copy(),
        imm=tape.imm[:n].copy(), aux=tape.aux[:n].copy(),
    )
    return t


def build_unrolled_kernel(tape, *, s0, V, interpret=False, scratch=False):
    fm = FloatMode(kernel_namespace(jnp), choice_dtype=jnp.int32)

    if not scratch:
        # naive: registers as traced values -> Mosaic tracks ~reg_count
        # live vregs; compile blows up superlinearly past ~500 ops
        def kernel(vars_ref, out_ref):
            inputs = [vars_ref[0, i] for i in range(V)]
            outs, _ = eval_tape(tape, fm, inputs)
            val = outs[0] if outs and outs[0] is not None else inputs[0]
            out_ref[0, 0] = val

        scratch_shapes = []
    else:
        # registers live in a VMEM scratch file indexed with STATIC
        # indices; the live vreg set per op is tiny, so Mosaic's
        # allocation stays linear
        from fidget_tpu.compiler.tape import (
            BINARY_TAPE_OPS, CHOICE_TAPE_OPS, IMM, UNARY_TAPE_OPS, TapeOp,
        )

        nf = tape.reg_count + tape.mem_count
        nr = tape.reg_count

        def kernel(vars_ref, out_ref, regs):
            like = vars_ref[0, 0]
            n = len(tape)
            for i in range(n):
                op = TapeOp(int(tape.op[i]))
                out = int(tape.out[i])
                a = int(tape.a[i])
                b = int(tape.b[i])
                imm = float(tape.imm[i])
                aux = int(tape.aux[i])
                if op == TapeOp.INPUT:
                    regs[out] = vars_ref[0, aux]
                elif op == TapeOp.OUTPUT:
                    out_ref[0, aux] = regs[out]
                elif op == TapeOp.LOAD:
                    regs[out] = regs[nr + aux]
                elif op == TapeOp.STORE:
                    regs[nr + aux] = regs[out]
                elif op == TapeOp.COPY:
                    regs[out] = (
                        jnp.full((s0, 128), imm, jnp.float32)
                        if a == IMM else regs[a]
                    )
                elif op in UNARY_TAPE_OPS:
                    regs[out] = fm.unary(op, regs[a])
                elif op in BINARY_TAPE_OPS:
                    va = (
                        jnp.full((s0, 128), imm, jnp.float32)
                        if a == IMM else regs[a]
                    )
                    vb = (
                        jnp.full((s0, 128), imm, jnp.float32)
                        if b == IMM else regs[b]
                    )
                    if op in CHOICE_TAPE_OPS:
                        regs[out] = fm.choice_binary(op, va, vb)[0]
                    else:
                        regs[out] = fm.binary(op, va, vb)

        scratch_shapes = [pltpu.VMEM((nf, s0, 128), jnp.float32)]

    def run(vars_):
        T = vars_.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[pl.BlockSpec((1, V, s0, 128), lambda i: (i, 0, 0, 0))],
            out_specs=pl.BlockSpec((1, 1, s0, 128), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((T, 1, s0, 128), jnp.float32),
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(vars_)

    return jax.jit(run)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 7867
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    tape = load_vm_tape("prospero.vm")
    tape = prefix_tape(tape, n)
    print(f"tape len {len(tape)}, regs {tape.reg_count}, mem {tape.mem_count}")
    V = max(1, len(tape.var_map))
    s0 = (tile * tile) // 128
    N = 1024
    T = (N // tile) ** 2
    print(f"tile {tile}, s0 {s0}, T {T}")

    scratch = "--scratch" in sys.argv
    interpret = jax.devices()[0].platform == "cpu"
    fn = build_unrolled_kernel(
        tape, s0=s0, V=V, interpret=interpret, scratch=scratch
    )

    rng = np.random.default_rng(0)
    vars_ = rng.uniform(-1, 1, size=(T, V, s0, 128)).astype(np.float32)

    t0 = time.perf_counter()
    out = fn(jnp.asarray(vars_))
    _ = float(jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0)))
    t1 = time.perf_counter()
    print(f"first call (compile+run): {t1 - t0:.1f} s")

    # correctness vs host oracle on a handful of lanes
    fm = FloatMode(kernel_namespace(np))
    inputs = [vars_[0, i].reshape(-1) for i in range(V)]
    with np.errstate(all="ignore"):
        outs, _ = eval_tape(tape, fm, inputs)
    want = outs[0] if outs and outs[0] is not None else inputs[0]
    got = np.asarray(out[0, 0]).reshape(-1)
    both_nan = np.isnan(got) & np.isnan(want)
    ok = both_nan | np.isclose(got, want, rtol=1e-5, atol=1e-6)
    print(f"correctness: {ok.mean() * 100:.2f}% lanes agree")

    # steady-state: K-perturbed frames inside one jitted loop
    def timed(vbase, K):
        def body(k, acc):
            v = vbase + k.astype(jnp.float32) * 1e-6
            o = fn_inner(v)
            return acc + jnp.sum(o[0, 0, 0])

        return lax.fori_loop(0, K, body, jnp.float32(0.0))

    fn_inner = fn
    timed_jit = jax.jit(timed, static_argnames=("K",))
    for K in (4, 16):
        t0 = time.perf_counter()
        _ = float(timed_jit(jnp.asarray(vars_), K))
        t1 = time.perf_counter()
        print(f"K={K}: total {(t1 - t0) * 1e3:.1f} ms (incl 1st compile)")
    # slope
    t0 = time.perf_counter(); _ = float(timed_jit(jnp.asarray(vars_ * 1.0001), 4)); t4 = time.perf_counter() - t0
    t0 = time.perf_counter(); _ = float(timed_jit(jnp.asarray(vars_ * 1.0002), 16)); t16 = time.perf_counter() - t0
    ms = (t16 - t4) / 12 * 1e3
    mpix = (T * s0 * 128) / (ms * 1e-3) / 1e6 if ms > 0 else float("nan")
    print(f"slope: {ms:.2f} ms/frame = {mpix:.1f} Mpix/s (all tiles active)")


if __name__ == "__main__":
    main()
