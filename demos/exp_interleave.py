"""Microbenchmark: does interleaving two independent tape streams in
one Pallas instance hide the interpreter's serial step latency?

Variant A: the production interp_float (1 tape / instance).
Variant B: experimental kernel, 2 tapes + 2 register files / instance,
one fori_loop executing step j of both streams per iteration.

Same total work: A runs T instances x L steps; B runs T/2 instances x
L steps (x2 streams). If the per-step cost is dependency-latency-bound,
B approaches 2x; if it's scalar-decode/switch-issue-bound, B is ~1x.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fidget_tpu.compiler.pack import IMM12
from fidget_tpu.compiler.tape import TapeOp
from fidget_tpu.eval.arith import FloatMode
from fidget_tpu.eval.pallas_interp import (
    _N_OPS,
    _PLAIN_BINARY_OPS,
    _UNARY_OPS,
    _CHOICE_OPS,
    _decode,
    interp_float,
)
from fidget_tpu.eval.softmath import kernel_namespace


def random_tape(L, nf, rng):
    """Random arithmetic tape over nf registers (no outputs needed)."""
    ops = rng.choice(
        [int(TapeOp.ADD), int(TapeOp.SUB), int(TapeOp.MUL),
         int(TapeOp.MAX), int(TapeOp.MIN)],
        size=L,
    )
    out = rng.integers(0, nf, L)
    a = rng.integers(0, nf, L)
    b = rng.integers(0, nf, L)
    aux = np.zeros(L, np.int64)
    w1 = ops | (out << 7) | (a << 19)
    w2 = b | (aux << 12)
    return w1.astype(np.int32), w2.astype(np.int32)


def interp_float2(w1a, w2a, imma, w1b, w2b, immb, lens, vars_, *, nf, s0):
    """Two-stream interpreter: instance i runs tapes a[i] and b[i]."""
    T, lcap = w1a.shape
    fm = FloatMode(kernel_namespace(jnp), choice_dtype=jnp.int32)
    n_inputs = vars_.shape[1]

    def kernel(w1a_r, w2a_r, imma_r, w1b_r, w2b_r, immb_r, len_r, vars_r,
               out_ref, regsA, regsB):
        n = len_r[0, 0, 0]

        def body(j, regs, w1_r, w2_r, imm_r):
            op, out, a, b, aux = _decode(w1_r[0, 0, j], w2_r[0, 0, j])
            immv = imm_r[0, 0, j]
            imm_plane = jnp.full((s0, 128), immv, jnp.float32)
            va = jnp.where(a == IMM12, imm_plane, regs[jnp.minimum(a, nf - 1)])
            vb = jnp.where(b == IMM12, imm_plane, regs[jnp.minimum(b, nf - 1)])
            aux_in = jnp.minimum(aux, n_inputs - 1)
            branches = [lambda: va] * _N_OPS
            branches[TapeOp.INPUT] = lambda: vars_r[0, aux_in]
            for u in _UNARY_OPS:
                branches[u] = (lambda u=u: fm.unary(u, va))
            for bop in _PLAIN_BINARY_OPS:
                branches[bop] = (lambda bop=bop: fm.binary(bop, va, vb))
            for cop in _CHOICE_OPS:
                branches[cop] = (lambda cop=cop: fm.choice_binary(cop, va, vb)[0])
            res = lax.switch(op, branches)
            regs[out] = res

        def step(j, _):
            body(j, regsA, w1a_r, w2a_r, imma_r)
            body(j, regsB, w1b_r, w2b_r, immb_r)
            return 0

        lax.fori_loop(0, jnp.minimum(n, lcap), step, 0)
        out_ref[0, 0] = regsA[0]
        out_ref[0, 1] = regsB[0]

    smem = lambda: pl.BlockSpec(
        (1, 1, lcap), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[smem(), smem(), smem(), smem(), smem(), smem(),
                  pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, n_inputs, s0, 128),
                               lambda i: (i, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, 2, s0, 128), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, 2, s0, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nf, s0, 128), jnp.float32)
                        for _ in range(2)],
    )(
        w1a.reshape(T, 1, -1), w2a.reshape(T, 1, -1), imma.reshape(T, 1, -1),
        w1b.reshape(T, 1, -1), w2b.reshape(T, 1, -1), immb.reshape(T, 1, -1),
        jnp.full((T, 1, 1), lcap, jnp.int32), vars_,
    )


def bench(fn, *args, iters=3):
    r = fn(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    T, L, nf, s0 = 256, 1024, 32, 32
    V = 1
    w1 = np.zeros((T, L), np.int32)
    w2 = np.zeros((T, L), np.int32)
    for i in range(T):
        w1[i], w2[i] = random_tape(L, nf, rng)
    imm = np.zeros((T, L), np.float32)
    lens = np.full(T, L, np.int32)
    vars_ = jnp.asarray(rng.normal(size=(T, V, s0, 128)).astype(np.float32))

    f1 = jax.jit(functools.partial(
        interp_float, nf=nf, n_inputs=V, n_outputs=1, s0=s0, interpret=False
    ))
    # NOTE: vary data per call to defeat the dispatch cache
    def runA(k):
        return f1(jnp.asarray(w1), jnp.asarray(w2),
                  jnp.asarray(imm) + k * 1e-6, jnp.asarray(lens), vars_)

    Th = T // 2
    f2 = jax.jit(functools.partial(interp_float2, nf=nf, s0=s0))
    def runB(k):
        return f2(jnp.asarray(w1[:Th]), jnp.asarray(w2[:Th]),
                  jnp.asarray(imm[:Th]) + k * 1e-6,
                  jnp.asarray(w1[Th:]), jnp.asarray(w2[Th:]),
                  jnp.asarray(imm[Th:]) + k * 1e-6,
                  jnp.asarray(lens[:Th]), vars_[:Th])

    # defeat dispatch cache by perturbing imm per call
    import itertools
    counter = itertools.count(1)
    tA = bench(lambda: runA(next(counter)))
    tB = bench(lambda: runB(next(counter)))
    stepsA = T * L
    print(f"A (1 stream/inst): {tA*1e3:7.2f} ms  {tA/stepsA*1e9:6.1f} ns/step")
    print(f"B (2 streams/inst): {tB*1e3:7.2f} ms  {tB/stepsA*1e9:6.1f} ns/step-equiv"
          f"  speedup x{tA/tB:.2f}")


if __name__ == "__main__":
    main()
