"""Decompose the per-step cost: base vs switch-scan position vs lanes.

Tapes of a single repeated opcode at different switch positions,
slope-corrected over K batches.
"""
import os, sys, time, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from fidget_tpu.compiler.tape import TapeOp
from fidget_tpu.eval.pallas_interp import interp_float

def mono_tape(op, L, nf, cyc=8):
    # out r[(i+1)%cyc] <- op(r[i%cyc], r[(i+3)%cyc]) — serial-ish chain
    i = np.arange(L)
    out = (i + 1) % cyc
    a = i % cyc
    b = (i + 3) % cyc
    w1 = (int(op) | (out << 7) | (a << 19)).astype(np.int32)
    w2 = b.astype(np.int32)
    return w1, w2

def main():
    T, L, nf, V = 64, 1024, 16, 1
    rng = np.random.default_rng(0)
    for s0 in (32, 128):
        vars_ = jnp.asarray(rng.normal(size=(T, V, s0, 128)).astype(np.float32))
        print(f"--- s0={s0}")
        for op in (TapeOp.MAX, TapeOp.ADD, TapeOp.MUL, TapeOp.ABS,
                   TapeOp.COMPARE, TapeOp.ATAN):
            w1r, w2r = mono_tape(op, L, nf)
            d = (jnp.asarray(np.broadcast_to(w1r, (T, L)).copy()),
                 jnp.asarray(np.broadcast_to(w2r, (T, L)).copy()),
                 jnp.asarray(np.zeros((T, L), np.float32)),
                 jnp.asarray(np.full(T, L, np.int32)))
            def mk(K):
                @jax.jit
                def many(v, zs):
                    def body(i, acc):
                        out = interp_float(*d, v + zs[i] * 1e-7, nf=nf,
                                           n_inputs=V, n_outputs=1, s0=s0,
                                           interpret=False)
                        return acc + jnp.sum(out)
                    return lax.fori_loop(0, K, body, jnp.float32(0.0))
                return many
            def batch(K):
                f = mk(K)
                zs = jnp.arange(K, dtype=jnp.float32)
                float(f(vars_, zs))
                best = float("inf")
                for i in range(2):
                    t0 = time.perf_counter(); float(f(vars_, zs + (i+1)))
                    best = min(best, time.perf_counter() - t0)
                return best
            slope = (batch(8) - batch(2)) / 6
            print(f"  {op.name:8s} pos={int(op):2d}: "
                  f"{slope/(T*L)*1e9:6.1f} ns/step")

if __name__ == "__main__":
    main()
