"""Measure the tape-simplification opportunity in the unrolled leaf.

VERDICT r3 item 3: the reference's JIT leaf runs per-region
*simplified* tapes (fidget-raster/src/pixel.rs:371-397 +
fidget-core/src/vm/data.rs:123-314, typically ~10x shorter on
prospero), while our unrolled leaf executes the FULL tape on every
active tile. Before prototyping anything, measure what simplification
would actually buy at the 8-px cull granularity on prospero 1024^2:
per active tile, capture the interval pass's choice trace, host-
simplify, and histogram the surviving tape lengths.

Pure NumPy (no device needed): a vectorized interval interpreter over
all root tiles at once, then `compiler.simplify` per sampled tile.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from fidget_tpu.compiler.simplify import simplify
from fidget_tpu.compiler.tape import (
    BINARY_TAPE_OPS, CHOICE_TAPE_OPS, IMM, Tape, TapeOp,
)
from fidget_tpu.eval.arith import IntervalMode
from fidget_tpu.io.models import load_vm_tape

N = 1024
T = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SAMPLE = 2048


def interval_all_tiles(tape: Tape, T: int):
    """Vectorized NumPy interval eval of every TxT root tile; returns
    (lo, hi, choices [n_tiles, choice_count])."""
    n0 = N // T
    # world is the +-1 square, y flipped (region.rs:6-57)
    xs = np.linspace(-1, 1, N + 1)[: N + 1 : T]
    lo_x, hi_x = xs[:-1], xs[1:]
    gxlo, gylo = np.meshgrid(lo_x, lo_x)
    gxhi, gyhi = np.meshgrid(hi_x, hi_x)
    xlo = gxlo.reshape(-1).astype(np.float32)
    xhi = gxhi.reshape(-1).astype(np.float32)
    ylo = -gyhi.reshape(-1).astype(np.float32)
    yhi = -gylo.reshape(-1).astype(np.float32)

    axis_kind = {i: v.kind for v, i in tape.var_map.items()}
    im = IntervalMode(np)
    regs = {}
    mem = {}
    n_tiles = n0 * n0
    choices = np.zeros((n_tiles, tape.choice_count), np.uint8)
    ci = 0
    zero = np.zeros(n_tiles, np.float32)
    out = None
    for i in range(len(tape)):
        op = TapeOp(int(tape.op[i]))
        o, a, b = int(tape.out[i]), int(tape.a[i]), int(tape.b[i])
        imm = float(tape.imm[i])
        aux = int(tape.aux[i])
        if op == TapeOp.INPUT:
            kind = axis_kind.get(aux)
            regs[o] = {
                "x": (xlo, xhi), "y": (ylo, yhi),
            }.get(kind, (zero, zero))
        elif op == TapeOp.OUTPUT:
            out = regs[o]
        elif op == TapeOp.LOAD:
            regs[o] = mem[aux]
        elif op == TapeOp.STORE:
            mem[aux] = regs[o]
        elif op == TapeOp.COPY:
            regs[o] = regs[a] if a != IMM else \
                (np.full(n_tiles, imm, np.float32),) * 2
        elif op in CHOICE_TAPE_OPS:
            c2 = (np.full(n_tiles, imm, np.float32),) * 2
            va = regs[a] if a != IMM else c2
            vb = regs[b] if b != IMM else c2
            regs[o], ch = im.choice_binary(op, va, vb)
            choices[:, ci] = ch
            ci += 1
        elif op in BINARY_TAPE_OPS:
            c2 = (np.full(n_tiles, imm, np.float32),) * 2
            va = regs[a] if a != IMM else c2
            vb = regs[b] if b != IMM else c2
            regs[o] = im.binary(op, va, vb)
        else:
            regs[o] = im.unary(op, regs[a])
    return out[0], out[1], choices


def main():
    tape = load_vm_tape("prospero.vm")
    print(f"tape: {len(tape)} ops, {tape.choice_count} choice ops")
    t0 = time.time()
    lo, hi, choices = interval_all_tiles(tape, T)
    active = ~((hi < 0) | (lo > 0))
    print(
        f"interval pass {time.time()-t0:.1f}s; tiles {active.size}, "
        f"active {active.sum()} ({active.mean():.1%})"
    )
    idx = np.flatnonzero(active)
    rng = np.random.RandomState(0)
    if len(idx) > SAMPLE:
        idx = rng.choice(idx, SAMPLE, replace=False)
    t0 = time.time()
    lengths = np.array(
        [len(simplify(tape, choices[i])) for i in idx], np.int64
    )
    print(f"simplify x{len(idx)}: {time.time()-t0:.1f}s")
    qs = np.percentile(lengths, [5, 25, 50, 75, 95, 99])
    print(
        f"simplified lengths: mean {lengths.mean():.0f} "
        f"(x{len(tape)/lengths.mean():.1f} shorter) "
        f"p5/p25/p50/p75/p95/p99 = {qs.astype(int).tolist()}"
    )
    hist, edges = np.histogram(
        lengths, bins=[0, 128, 256, 512, 1024, 2048, 4096, len(tape) + 1]
    )
    for h, e0, e1 in zip(hist, edges[:-1], edges[1:]):
        print(f"  [{e0:5d},{e1:5d}): {h:5d}  {h/len(lengths):.1%}")
    # the quantity that matters for the leaf's arithmetic: mean ops
    # per active tile relative to full-tape-everywhere
    print(
        f"leaf arithmetic if per-tile simplified: "
        f"{lengths.mean()/len(tape):.2%} of current"
    )


if __name__ == "__main__":
    main()
