"""Trace-time-optimized unrolled float evaluation.

The generic `eval_tape` + FloatMode path costs ~2 ms of JAX trace time
per *choice* op (each `choice_binary` builds 3 `jnp.where` chains for
value + choice codes that are then dead-code-eliminated anyway). On
min/max-heavy tapes like prospero (thousands of choice ops) that made
"compile the whole tape" take minutes of TRACING before XLA even saw
it.

This evaluator produces the identical float values with a minimal
trace footprint:

- MIN/MAX emit a single `jnp.minimum`/`jnp.maximum` (NaN-propagating,
  matching the reference's point semantics fidget-core/src/vm/
  mod.rs:665-699 — strict compare picks a side, ties return the same
  value either way, NaN poisons);
- AND/OR emit one compare + one `where`
  (a == 0 ? a : b / a != 0 ? a : b);
- immediates stay Python floats (weak-typed scalar operands — no
  `full_like` equations);
- no choice-code capture (the unrolled mode never simplifies).

Used by the tiled-unrolled 2D pipeline and `render_dense`.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..compiler.tape import (
    BINARY_TAPE_OPS,
    CHOICE_TAPE_OPS,
    IMM,
    UNARY_TAPE_OPS,
    Tape,
    TapeOp,
)
from .arith import FloatMode
from .softmath import kernel_namespace


def eval_tape_float_fast(tape: Tape, inputs: list, *, softmath: bool = False):
    """Float-mode unrolled evaluation of `tape` over jnp arrays.

    Args:
      tape: register tape (static; baked into the trace).
      inputs: one jnp array per tape input index (common shape).
      softmath: use the kernel polynomial transcendentals (matches the
        Pallas kernels bit-for-bit; default native XLA transcendentals
        like the host oracle).
    Returns:
      list of output arrays (one per tape output).
    """
    xp = kernel_namespace(jnp) if softmath else jnp
    fm = FloatMode(xp)
    regs: dict[int, object] = {}
    mem: dict[int, object] = {}
    outputs: list = [None] * tape.output_count

    ops = tape.op.tolist()
    outs_ = tape.out.tolist()
    aas = tape.a.tolist()
    bbs = tape.b.tolist()
    imms = tape.imm.tolist()
    auxs = tape.aux.tolist()

    MIN, MAX = int(TapeOp.MIN), int(TapeOp.MAX)
    AND, OR = int(TapeOp.AND), int(TapeOp.OR)
    INPUT, OUTPUT = int(TapeOp.OUTPUT), 0  # placeholders replaced below
    INPUT = int(TapeOp.INPUT)
    OUTPUT = int(TapeOp.OUTPUT)
    LOAD, STORE, COPY = int(TapeOp.LOAD), int(TapeOp.STORE), int(TapeOp.COPY)
    UNARY = frozenset(int(o) for o in UNARY_TAPE_OPS)
    PLAIN_BIN = frozenset(
        int(o) for o in BINARY_TAPE_OPS if o not in CHOICE_TAPE_OPS
    )

    for i in range(len(ops)):
        op = ops[i]
        out = outs_[i]
        a = aas[i]
        b = bbs[i]
        if op == MIN or op == MAX:
            va = imms[i] if a == IMM else regs[a]
            vb = imms[i] if b == IMM else regs[b]
            regs[out] = (
                jnp.minimum(va, vb) if op == MIN else jnp.maximum(va, vb)
            )
        elif op in PLAIN_BIN:
            va = imms[i] if a == IMM else regs[a]
            vb = imms[i] if b == IMM else regs[b]
            regs[out] = fm.binary(TapeOp(op), va, vb)
        elif op in UNARY:
            regs[out] = fm.unary(TapeOp(op), regs[a])
        elif op == INPUT:
            regs[out] = inputs[auxs[i]]
        elif op == OUTPUT:
            outputs[auxs[i]] = regs[out]
        elif op == AND or op == OR:
            va = imms[i] if a == IMM else regs[a]
            vb = imms[i] if b == IMM else regs[b]
            left = (va == 0.0) if op == AND else (va != 0.0)
            regs[out] = jnp.where(left, va, vb)
        elif op == COPY:
            regs[out] = (
                jnp.full(inputs[0].shape, imms[i], jnp.float32)
                if a == IMM else regs[a]
            )
        elif op == LOAD:
            regs[out] = mem[auxs[i]]
        elif op == STORE:
            mem[auxs[i]] = regs[out]
        else:
            raise ValueError(f"cannot evaluate op {op}")

    for o in range(len(outputs)):
        if outputs[o] is not None and not hasattr(outputs[o], "shape"):
            outputs[o] = jnp.full(inputs[0].shape, outputs[o], jnp.float32)
    return outputs
