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
import numpy as np

from ..compiler.tape import (
    BINARY_TAPE_OPS,
    CHOICE_TAPE_OPS,
    IMM,
    UNARY_TAPE_OPS,
    Tape,
    TapeOp,
)
from .arith import FloatMode, IntervalMode
from .softmath import kernel_namespace


def eval_tape_interval_fast(
    tape: Tape, inputs: list, *, capture: bool = False, u_words=None,
):
    """Interval-mode unrolled evaluation with a minimal trace footprint.

    Built for the tiled-unrolled pipeline's CULL stage: the whole tape
    as straight-line XLA interval arithmetic over per-tile boxes — no
    interpreter scan (~90 ns/step/instance) and, by default, no choice
    capture.

    capture=True additionally packs a 2-bit choice code per choice op
    (1=Left, 2=Right, 3=Both — reference interval semantics,
    fidget-core/src/types/interval.rs:295-381; NaN operands capture
    Both, which is always sound) into uint32 words — choice j lands in
    word j//16 at bit 2*(j%16), the layout `compiler.unions.
    pack_choices` mirrors on the host. Returns (los, his, words) where
    `words` is a list of ceil(choice_count/16) uint32 arrays. The
    union-tape leaf (render2d) uses these for its per-frame
    tape-validity test.

    u_words (mutually exclusive with capture=True) switches to
    VIOLATION mode: a [cw, lanes] uint32 array of reference 2-bit
    codes per lane (same packing, word-major so each word is a
    contiguous lane row); the return is (los, his, viol) where
    viol[lane] is True iff ANY choice's captured code has a bit
    outside the reference code — i.e. the lane's trace is NOT a
    subset, so a tape simplified under the reference codes would be
    unsound for it. One fused bool instead of cw materialized words.

    Semantics are the reference's interval rules
    (fidget-core/src/types/interval.rs) with one deliberate relaxation:
    instead of `IntervalMode`'s explicit has-NaN poisoning on every op,
    NaN flows through XLA's NaN-PROPAGATING `jnp.minimum`/`maximum`
    corner folds. Anywhere the two differ the fast bounds are NaN where
    the oracle's are finite-after-ignoring-NaN-corners — and a NaN
    bound fails both cull comparisons (`hi < 0`, `lo > 0`), so the tile
    stays ACTIVE and is resolved by the leaf. Proofs are therefore
    always sound and, on NaN-free paths, bit-identical to the oracle
    (certified by tests/test_render2d.py's unrolled-vs-brute checks and
    test_unrolled_fast.py's containment fuzz).

    Args:
      tape: register tape (static; baked into the trace).
      inputs: one (lo, hi) pair of jnp arrays per tape input index.
    Returns:
      (los, his): per-output lists of bound arrays.
    """
    im = IntervalMode(jnp)
    regs: dict[int, tuple] = {}
    mem: dict[int, tuple] = {}
    n_out = tape.output_count
    los: list = [None] * n_out
    his: list = [None] * n_out

    ops = tape.op.tolist()
    outs_ = tape.out.tolist()
    aas = tape.a.tolist()
    bbs = tape.b.tolist()
    imms = tape.imm.tolist()
    auxs = tape.aux.tolist()

    MIN, MAX = int(TapeOp.MIN), int(TapeOp.MAX)
    AND, OR = int(TapeOp.AND), int(TapeOp.OR)
    DIV = int(TapeOp.DIV)
    INPUT = int(TapeOp.INPUT)
    OUTPUT = int(TapeOp.OUTPUT)
    LOAD, STORE, COPY = int(TapeOp.LOAD), int(TapeOp.STORE), int(TapeOp.COPY)
    UNARY = frozenset(int(o) for o in UNARY_TAPE_OPS)
    PLAIN_BIN = frozenset(
        int(o) for o in BINARY_TAPE_OPS if o not in CHOICE_TAPE_OPS
    )

    like = inputs[0][0]
    #: per-word OR-accumulated int32 choice contributions (capture)
    words: list = []
    n_choice_seen = 0
    #: violation mode: single running bool accumulator (see below)
    viol = None
    u_cur = [None, -1]  # current sliced word, its index

    def emit_choice(left, right):
        """Captures one choice from bool (left, right) lane masks."""
        nonlocal n_choice_seen, viol
        j = n_choice_seen
        n_choice_seen += 1
        if u_words is not None:
            # violation mode: fold the per-lane subset test against
            # the reference codes u (2-bit, same packing) directly
            # into ONE running bool + one in-flight packed word —
            # materializing all ceil(C/16) words as live accumulators
            # measured +0.38 ms on prospero's cull
            # (demos/exp_union_stages.py). Per choice: 3 int ops;
            # per completed word: one contiguous u row read and one
            # subset compare ((acc | u) == u).
            s = 2 * (j % 16)
            contrib = jnp.where(
                left,
                np.uint32(1 << s),
                jnp.where(right, np.uint32(2 << s), np.uint32(3 << s)),
            )
            u_cur[0] = contrib if s == 0 else (u_cur[0] | contrib)
            if j % 16 == 15 or j == tape.choice_count - 1:
                # u_words is [cw, lanes] word-major: contiguous rows
                u = u_words[j // 16]
                v = (u_cur[0] | u) != u
                viol = v if viol is None else (viol | v)
            return
        if not capture:
            return
        s = 2 * (j % 16)
        contrib = jnp.where(
            left,
            np.uint32(1 << s),
            jnp.where(right, np.uint32(2 << s), np.uint32(3 << s)),
        )
        w = j // 16
        if w == len(words):
            words.append(contrib)
        else:
            words[w] = words[w] | contrib

    def operand(sel, imm):
        if sel == IMM:
            return (imm, imm)  # weak scalar; broadcasts in arithmetic
        return regs[sel]

    for i in range(len(ops)):
        op = ops[i]
        out = outs_[i]
        a = aas[i]
        b = bbs[i]
        if op == MIN or op == MAX:
            al, au = operand(a, imms[i])
            bl, bu = operand(b, imms[i])
            if op == MIN:
                regs[out] = (jnp.minimum(al, bl), jnp.minimum(au, bu))
                # NaN anywhere fails both strict compares -> Both
                emit_choice(au < bl, bu < al)
            else:
                regs[out] = (jnp.maximum(al, bl), jnp.maximum(au, bu))
                emit_choice(al > bu, bl > au)
        elif op == DIV:
            (al, au) = operand(a, imms[i])
            (bl, bu) = operand(b, imms[i])
            q0, q1, q2, q3 = al / bl, al / bu, au / bl, au / bu
            lo = jnp.minimum(jnp.minimum(q0, q1), jnp.minimum(q2, q3))
            hi = jnp.maximum(jnp.maximum(q0, q1), jnp.maximum(q2, q3))
            # denominator spanning zero -> unbounded: poison (NaN fails
            # both cull comparisons). NaN operands propagate via the
            # corner quotients. An immediate denominator is a Python
            # float here: `~(py bool)` is the integer -2/-1 (always
            # truthy), which once poisoned EVERY div-by-constant — so
            # scalar denominators take the static branch instead.
            if b == IMM:
                if imms[i] != 0.0:
                    regs[out] = (lo, hi)
                else:
                    n = jnp.full_like(like, np.nan)
                    regs[out] = (n, n)
            else:
                bad = ~((bl > 0.0) | (bu < 0.0))
                n = jnp.full_like(lo + like, np.nan)
                regs[out] = (jnp.where(bad, n, lo), jnp.where(bad, n, hi))
        elif op in PLAIN_BIN:
            va = operand(a, imms[i])
            vb = operand(b, imms[i])
            if a == IMM:
                va = (jnp.full_like(like, imms[i]),) * 2
            if b == IMM:
                vb = (jnp.full_like(like, imms[i]),) * 2
            regs[out] = im.binary(TapeOp(op), va, vb)
        elif op in UNARY:
            regs[out] = im.unary(TapeOp(op), regs[a])
        elif op == INPUT:
            regs[out] = inputs[auxs[i]]
        elif op == OUTPUT:
            los[auxs[i]], his[auxs[i]] = regs[out]
        elif op == AND or op == OR:
            va = operand(a, imms[i])
            vb = operand(b, imms[i])
            if a == IMM:
                va = (jnp.full_like(like, imms[i]),) * 2
            if b == IMM:
                vb = (jnp.full_like(like, imms[i]),) * 2
            val, ch = im.choice_binary(TapeOp(op), va, vb)
            regs[out] = val
            emit_choice(ch == 1, ch == 2)
        elif op == COPY:
            if a == IMM:
                c = jnp.full_like(like, imms[i])
                regs[out] = (c, c)
            else:
                regs[out] = regs[a]
        elif op == LOAD:
            regs[out] = mem[auxs[i]]
        elif op == STORE:
            mem[auxs[i]] = regs[out]
        else:
            raise ValueError(f"cannot evaluate op {op}")

    for o in range(n_out):
        if los[o] is not None and not hasattr(los[o], "shape"):
            los[o] = jnp.full_like(like, los[o])
            his[o] = jnp.full_like(like, his[o])
    if u_words is not None:
        assert n_choice_seen == tape.choice_count
        if viol is None:
            viol = jnp.zeros(like.shape, bool)
        return los, his, jnp.broadcast_to(viol, like.shape)
    if capture:
        assert n_choice_seen == tape.choice_count
        words = [jnp.broadcast_to(w, like.shape) for w in words]
        return los, his, words
    return los, his


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
