"""Synthetic interp_interval probe: isolate the (T, s0) combinations
that hang/crash the TPU worker.

Usage: python demos/probe_interval.py <T> <s0>
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from fidget_tpu.compiler.pack import pack_tapes
from fidget_tpu.eval.pallas_interp import interp_interval
from fidget_tpu.shape import Shape, Tree


def main():
    T = int(sys.argv[1])
    s0 = int(sys.argv[2])
    x, y, z = Tree.axes()
    s = 4.0
    g = (
        (x * s).sin() * (y * s).cos()
        + (y * s).sin() * (z * s).cos()
        + (z * s).sin() * (x * s).cos()
    )
    shape = Shape.from_tree(
        ((x.square() + y.square() + z.square()).sqrt() - 0.8).max(
            abs(g) - 0.2
        )
    )
    tape = shape.tape()
    p = pack_tapes([tape])
    nf = tape.reg_count + tape.mem_count
    V = max(1, len(tape.var_map))
    w1 = jnp.broadcast_to(jnp.asarray(p.w1), (T, p.w1.shape[1]))
    w2 = jnp.broadcast_to(jnp.asarray(p.w2), (T, p.w2.shape[1]))
    imm = jnp.broadcast_to(jnp.asarray(p.imm), (T, p.imm.shape[1]))
    lens = jnp.broadcast_to(jnp.asarray(p.lengths), (T,))
    rng = np.random.default_rng(0)
    lo = rng.normal(size=(T, V, s0, 128)).astype(np.float32)
    var_lo = jnp.asarray(lo)
    var_hi = var_lo + 0.1
    print(f"probe T={T} s0={s0} nf={nf} L={p.w1.shape[1]}", flush=True)
    olo, ohi, ch = interp_interval(
        w1, w2, imm, lens, var_lo, var_hi,
        nf=nf, n_inputs=V, n_outputs=1, s0=s0, c_words=1, interpret=False,
    )
    print("OK", float(jnp.sum(olo)), flush=True)


if __name__ == "__main__":
    main()
