"""Measure the tape-simplification opportunity in the unrolled 2D leaf.

VERDICT r3 item 3: the unrolled leaf executes the FULL tape (7,867 ops
on prospero) on every active tile, while the reference's JIT leaf runs
per-region *simplified* tapes (fidget-raster/src/pixel.rs:371-397 +
fidget-core/src/vm/data.rs:123-314, typically ~10x shorter). Before
building anything, measure — on prospero.vm at 1024^2 with the
pipeline's 8-px cull tiles and real transform:

  1. per-active-tile simplified tape lengths (the reference's win);
  2. distinct choice signatures across active tiles (how much tapes
     repeat — the reference's RenderHandle memoizes on trace equality);
  3. the length of ONE tape simplified under the bitwise-OR (union) of
     all active tiles' choices — Both-is-safe means a union tape is
     valid for EVERY tile it was unioned over, so K precompiled union
     tapes + a per-tile subset test could replace per-tile tapes in a
     static XLA program;
  4. union lengths at spatial block granularities (2x2 ... 64x64 cull
     tiles per block) — the length-vs-#programs tradeoff curve.

Pure host measurement (NumPy interval evaluator with IntervalMode(np)
choice semantics + a vectorized liveness walk mirroring
compiler/simplify.py's counting); no device needed.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from fidget_tpu.compiler.simplify import simplify
from fidget_tpu.compiler.tape import (
    BINARY_TAPE_OPS,
    CHOICE_TAPE_OPS,
    IMM,
    UNARY_TAPE_OPS,
    TapeOp,
)
from fidget_tpu.eval.arith import IntervalMode
from fidget_tpu.render.transform import transform_intervals

CHOICE_LEFT, CHOICE_RIGHT, CHOICE_BOTH = 1, 2, 3


def interval_eval_np(tape, inputs):
    """NumPy interval evaluation with per-choice-op capture.

    inputs: list of (lo, hi) np arrays per tape input index.
    Returns (los, his, choices [n_choice, T] uint8)."""
    im = IntervalMode(np)
    regs = {}
    mem = {}
    los = [None] * tape.output_count
    his = [None] * tape.output_count
    choices = []
    like = inputs[0][0]

    def operand(sel, imm):
        if sel == IMM:
            c = np.full_like(like, imm)
            return (c, c)
        return regs[sel]

    UNARY = frozenset(int(o) for o in UNARY_TAPE_OPS)
    CHOICE = frozenset(int(o) for o in CHOICE_TAPE_OPS)
    PLAIN_BIN = frozenset(
        int(o) for o in BINARY_TAPE_OPS if o not in CHOICE_TAPE_OPS
    )
    for i in range(len(tape)):
        op = int(tape.op[i])
        out = int(tape.out[i])
        a, b = int(tape.a[i]), int(tape.b[i])
        imm = float(tape.imm[i])
        aux = int(tape.aux[i])
        if op in CHOICE:
            v, c = im.choice_binary(
                TapeOp(op), operand(a, imm), operand(b, imm)
            )
            regs[out] = v
            choices.append(c.astype(np.uint8))
        elif op in PLAIN_BIN:
            regs[out] = im.binary(TapeOp(op), operand(a, imm), operand(b, imm))
        elif op in UNARY:
            regs[out] = im.unary(TapeOp(op), regs[a])
        elif op == int(TapeOp.INPUT):
            regs[out] = inputs[aux]
        elif op == int(TapeOp.OUTPUT):
            los[aux], his[aux] = regs[out]
        elif op == int(TapeOp.COPY):
            regs[out] = operand(a, imm)
        elif op == int(TapeOp.LOAD):
            regs[out] = mem[aux]
        elif op == int(TapeOp.STORE):
            mem[aux] = regs[out]
        else:
            raise ValueError(f"op {op}")
    return los, his, (
        np.stack(choices) if choices else np.zeros((0, like.size), np.uint8)
    )


def simplified_lengths_np(tape, choices):
    """Vectorized twin of compiler.simplify.simplify()'s row counting:
    returns int32 [T] simplified tape lengths for T choice columns."""
    T = choices.shape[1]
    live_reg = np.zeros((tape.reg_count, T), bool)
    live_mem = np.zeros((max(tape.mem_count, 1), T), bool)
    count = np.zeros(T, np.int64)
    # forward choice index per row
    cidx = np.cumsum(
        [1 if TapeOp(int(o)) in CHOICE_TAPE_OPS else 0 for o in tape.op]
    ) - 1
    for i in range(len(tape) - 1, -1, -1):
        op = TapeOp(int(tape.op[i]))
        out = int(tape.out[i])
        a, b = int(tape.a[i]), int(tape.b[i])
        aux = int(tape.aux[i])
        if op == TapeOp.OUTPUT:
            live_reg[out] = True
            count += 1
            continue
        if op == TapeOp.STORE:
            sel = live_mem[aux].copy()
            live_mem[aux] = False
            live_reg[out] |= sel
            count += sel
            continue
        if op == TapeOp.LOAD:
            sel = live_reg[out].copy()
            live_reg[out] &= ~sel
            live_mem[aux] |= sel
            count += sel
            continue
        sel = live_reg[out].copy()
        if op == TapeOp.INPUT:
            live_reg[out] &= ~sel
            count += sel
        elif op == TapeOp.COPY:
            live_reg[out] &= ~sel
            if a != IMM:
                live_reg[a] |= sel
            count += sel
        elif op in CHOICE_TAPE_OPS:
            c = choices[cidx[i]]
            cB = sel & (c == CHOICE_BOTH)
            cL = sel & (c == CHOICE_LEFT)
            cR = sel & (c == CHOICE_RIGHT)
            count += cB
            # clear FIRST, then OR in operand liveness (a or b may BE
            # `out`; the host walk sets live_reg[src] after clearing)
            live_reg[out] &= ~sel
            if a == IMM:
                count += cL
            elif a == out:
                live_reg[out] |= cL  # elide: value already in place
            else:
                count += cL
                live_reg[a] |= cL
            if b == IMM:
                count += cR
            elif b == out:
                live_reg[out] |= cR
            else:
                count += cR
                live_reg[b] |= cR
            if a != IMM:
                live_reg[a] |= cB
            if b != IMM:
                live_reg[b] |= cB
        elif op in UNARY_TAPE_OPS:
            live_reg[out] &= ~sel
            live_reg[a] |= sel
            count += sel
        elif op in BINARY_TAPE_OPS:
            live_reg[out] &= ~sel
            if a != IMM:
                live_reg[a] |= sel
            if b != IMM:
                live_reg[b] |= sel
            count += sel
        else:
            raise ValueError(op)
    return count


def main(model="prospero.vm", N=1024, T0=8):
    from fidget_tpu.io.models import load_vm_tape
    from fidget_tpu.render.region import ImageSize
    from fidget_tpu.render.render2d import PixelRenderer

    tape = load_vm_tape(model)
    r = PixelRenderer(tape, ImageSize(N, N), interpret=True)
    n0 = N // T0
    tx = np.arange(n0, dtype=np.float32) * T0
    gx, gy = np.meshgrid(tx, tx)
    x0 = gx.reshape(-1)
    y0 = gy.reshape(-1)
    mat = r._mat4(None).astype(np.float32)
    im = IntervalMode(np)
    mxi, myi, mzi = transform_intervals(
        im, mat, (x0, x0 + T0), (y0, y0 + T0),
        (np.zeros_like(x0), np.zeros_like(x0)),
    )
    V = max(1, len(tape.var_map))
    axis_of = {v.kind: i for v, i in tape.var_map.items()}
    like = x0
    inputs = [(np.zeros_like(like), np.zeros_like(like)) for _ in range(V)]
    for kind, ivl in (("x", mxi), ("y", myi), ("z", mzi)):
        idx = axis_of.get(kind)
        if idx is not None:
            inputs[idx] = ivl

    t0 = time.time()
    los, his, choices = interval_eval_np(tape, inputs)
    print(f"interval eval over {n0*n0} tiles: {time.time()-t0:.1f}s")
    active = ~((his[0] < 0.0) | (los[0] > 0.0))
    nact = int(active.sum())
    print(f"tape len {len(tape)}, choice ops {tape.choice_count}, "
          f"active {nact}/{n0*n0} ({nact/(n0*n0):.1%})")

    ch_act = choices[:, active]
    t0 = time.time()
    lens = simplified_lengths_np(tape, ch_act)
    print(f"per-tile lengths walk: {time.time()-t0:.1f}s")
    qs = np.percentile(lens, [0, 10, 25, 50, 75, 90, 99, 100])
    print(f"per-active-tile simplified lengths: mean {lens.mean():.0f} "
          f"({len(tape)/lens.mean():.1f}x shorter), "
          f"p0/10/25/50/75/90/99/100 = {[int(q) for q in qs]}")

    # distinct signatures
    sig = np.ascontiguousarray(ch_act.T)
    uniq = np.unique(sig.view([("", sig.dtype)] * sig.shape[1]))
    print(f"distinct signatures among active tiles: {len(uniq)}")

    # union tapes at block granularities (block = k x k cull tiles)
    act2 = active.reshape(n0, n0)
    ch2 = choices.reshape(-1, n0, n0)
    for k in (1, 2, 4, 8, 16, 32, 64, n0):
        nb = n0 // k
        blk_act = act2.reshape(nb, k, nb, k)
        ch_blk = ch2.reshape(-1, nb, k, nb, k)
        # OR of choices over ACTIVE tiles only in each block
        masked = np.where(blk_act[None], ch_blk, 0)
        u = masked.transpose(0, 1, 3, 2, 4).reshape(-1, nb * nb, k * k)
        u = np.bitwise_or.reduce(u, axis=2)  # [n_choice, nb*nb]
        n_active_blk = blk_act.sum((1, 3)).reshape(-1)
        has = n_active_blk > 0
        if k == 1:
            # sanity: block==tile must reproduce per-tile lengths
            pass
        ulens = simplified_lengths_np(tape, u[:, has])
        w = n_active_blk[has]
        wmean = float((ulens * w).sum() / w.sum())
        print(
            f"block {k:3d}x{k:<3d}: {int(has.sum()):5d} programs, "
            f"tile-weighted mean union len {wmean:7.0f} "
            f"({len(tape)/wmean:4.1f}x), max {int(ulens.max())}"
        )

    # full-frame union via the host simplifier (cross-check)
    u_all = np.bitwise_or.reduce(ch_act, axis=1)
    st = simplify(tape, u_all)
    print(f"host simplify() union-of-all length: {len(st)}")


if __name__ == "__main__":
    main(*sys.argv[1:2], *(int(a) for a in sys.argv[2:]))
