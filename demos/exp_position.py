"""Does moving the SAME op to different switch positions change cost?"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from fidget_tpu.compiler.tape import TapeOp
from fidget_tpu.eval.pallas_interp import interp_float, _N_OPS
from demos.exp_interleave import random_tape

def order_with(op, pos):
    """Permutation placing canonical `op` at position `pos`."""
    rest = [o for o in range(_N_OPS) if o != int(op)]
    order = rest[:pos] + [int(op)] + rest[pos:]
    return tuple(order)

def main():
    T, L, nf, s0, V = 64, 1024, 16, 32, 1
    rng = np.random.default_rng(0)
    # tape of pure MAX ops (canonical code 3)
    i = np.arange(L)
    out = (i + 1) % 8; a = i % 8; b = (i + 3) % 8
    vars_ = jnp.asarray(rng.normal(size=(T, V, s0, 128)).astype(np.float32))
    for pos in (0, 3, 10, 20, 30):
        order = order_with(TapeOp.MAX, pos)
        rank = {c: p for p, c in enumerate(order)}
        code = rank[int(TapeOp.MAX)]
        w1 = (code | (out << 7) | (a << 19)).astype(np.int32)
        w2 = b.astype(np.int32)
        d = (jnp.asarray(np.broadcast_to(w1, (T, L)).copy()),
             jnp.asarray(np.broadcast_to(w2, (T, L)).copy()),
             jnp.asarray(np.zeros((T, L), np.float32)),
             jnp.asarray(np.full(T, L, np.int32)))
        K = 8
        @jax.jit
        def many(v, zs):
            def body(k, acc):
                r = interp_float(*d, v + zs[k] * 1e-7, nf=nf, n_inputs=V,
                                 n_outputs=1, s0=s0, interpret=False,
                                 op_order=order)
                return acc + jnp.sum(r)
            return lax.fori_loop(0, K, body, jnp.float32(0.0))
        zs = jnp.arange(K, dtype=jnp.float32)
        float(many(vars_, zs))
        best = float("inf")
        for it in range(3):
            t0 = time.perf_counter(); float(many(vars_, zs + it + 1))
            best = min(best, time.perf_counter() - t0)
        print(f"MAX at position {pos:2d}: {best/K/(T*L)*1e9:6.1f} ns/step")

if __name__ == "__main__":
    main()
