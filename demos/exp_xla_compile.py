"""Probe: XLA:TPU compile-time scaling for unrolled tapes.

The Mosaic straight-line kernel route is dead (superlinear compile:
500 ops = 10 s naive / 291 s scratch-file; 2000 ops > 9 min). This
probes the XLA route: jit of the host unrolled evaluator over tile
batches, with and without `optimization_barrier` fences every K ops
(fences cap fusion-search region size; live tape registers at the cut
are materialized, costing HBM traffic but bounding compile blowup).

Usage: python demos/exp_xla_compile.py <prefix_len> [barrier_every]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from fidget_tpu.compiler.tape import (
    BINARY_TAPE_OPS,
    CHOICE_TAPE_OPS,
    IMM,
    UNARY_TAPE_OPS,
    TapeOp,
)
from fidget_tpu.eval.arith import FloatMode
from fidget_tpu.io.models import load_vm_tape


def eval_tape_fenced(tape, fm, inputs, barrier_every=0):
    """Unrolled evaluation with optional optimization_barrier fences
    over the live register set every `barrier_every` ops."""
    regs, mem = {}, {}
    outputs = [None] * tape.output_count
    like = inputs[0]
    n = len(tape)
    for i in range(n):
        op = TapeOp(int(tape.op[i]))
        out = int(tape.out[i])
        a = int(tape.a[i])
        b = int(tape.b[i])
        imm = float(tape.imm[i])
        aux = int(tape.aux[i])
        if op == TapeOp.INPUT:
            regs[out] = inputs[aux]
        elif op == TapeOp.OUTPUT:
            outputs[aux] = regs[out]
        elif op == TapeOp.LOAD:
            regs[out] = mem[aux]
        elif op == TapeOp.STORE:
            mem[aux] = regs[out]
        elif op == TapeOp.COPY:
            regs[out] = fm.const(imm, like) if a == IMM else regs[a]
        elif op in UNARY_TAPE_OPS:
            regs[out] = fm.unary(op, regs[a])
        elif op in BINARY_TAPE_OPS:
            va = fm.const(imm, like) if a == IMM else regs[a]
            vb = fm.const(imm, like) if b == IMM else regs[b]
            if op in CHOICE_TAPE_OPS:
                regs[out] = fm.choice_binary(op, va, vb)[0]
            else:
                regs[out] = fm.binary(op, va, vb)
        if barrier_every and i % barrier_every == barrier_every - 1:
            keys = sorted(regs)
            vals = lax.optimization_barrier([regs[k] for k in keys])
            regs = dict(zip(keys, vals))
    return outputs


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    fence = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    tape = load_vm_tape("prospero.vm")
    print(f"prefix {n}/{len(tape)}, fence every {fence}")
    from demos.exp_unrolled_kernel import prefix_tape

    tape = prefix_tape(tape, n)
    V = max(1, len(tape.var_map))
    fm = FloatMode(jnp)

    # leaf-tile batch: C tiles of 32x32 px
    C = 256
    s0 = 8

    def fn(vars_):
        inputs = [vars_[:, i] for i in range(V)]
        outs = eval_tape_fenced(tape, fm, inputs, fence)
        val = outs[0] if outs and outs[0] is not None else inputs[0]
        return val

    jf = jax.jit(fn)
    rng = np.random.default_rng(0)
    vars_ = rng.uniform(-1, 1, size=(C, V, s0, 128)).astype(np.float32)

    t0 = time.perf_counter()
    lowered = jf.lower(jnp.asarray(vars_))
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    print(f"trace+lower {t1 - t0:.1f} s, XLA compile {t2 - t1:.1f} s")

    out = compiled(jnp.asarray(vars_))
    _ = float(jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0)))

    # throughput via K-slope
    def timed(v, K):
        def body(k, acc):
            o = fn(v + k.astype(jnp.float32) * 1e-6)
            return acc + o[0, 0, 0]

        return lax.fori_loop(0, K, body, jnp.float32(0.0))

    tj = jax.jit(timed, static_argnames=("K",))
    for K in (16, 64):
        _ = float(tj(jnp.asarray(vars_), K))  # compile
    t0 = time.perf_counter(); _ = float(tj(jnp.asarray(vars_ * 1.001), 16)); t4 = time.perf_counter() - t0
    t0 = time.perf_counter(); _ = float(tj(jnp.asarray(vars_ * 1.002), 64)); t16 = time.perf_counter() - t0
    ms = (t16 - t4) / 48 * 1e3
    px = C * s0 * 128
    print(f"slope {ms:.3f} ms/frame for {px} px -> "
          f"{px / (ms * 1e-3) / 1e6:.0f} Mpix/s-equivalent")


if __name__ == "__main__":
    main()
