"""interp_float cost vs arena width — device-resident tapes, no uploads."""
import os, sys, time, functools, itertools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from fidget_tpu.eval.pallas_interp import interp_float
from demos.exp_interleave import random_tape

def main():
    rng = np.random.default_rng(0)
    T, s0, V, nf, L = 256, 32, 1, 64, 872
    w1r, w2r = random_tape(L, nf, rng)
    vars_np = rng.normal(size=(T, V, s0, 128)).astype(np.float32)
    vars_ = jnp.asarray(vars_np)
    for W in (1024, 2048, 4096, 6464, 8192):
        w1 = np.zeros((T, W), np.int32); w1[:, :L] = w1r
        w2 = np.zeros((T, W), np.int32); w2[:, :L] = w2r
        d = dict(w1=jnp.asarray(w1), w2=jnp.asarray(w2),
                 imm=jnp.asarray(np.zeros((T, W), np.float32)),
                 lens=jnp.asarray(np.full(T, L, np.int32)))
        f = jax.jit(functools.partial(interp_float, nf=nf, n_inputs=V,
                                      n_outputs=1, s0=s0, interpret=False))
        c = itertools.count(1)
        def run():
            v = vars_ + np.float32(next(c) * 1e-6)  # device-side perturb
            return f(d["w1"], d["w2"], d["imm"], d["lens"], v)
        jax.block_until_ready(run())
        ts = []
        for _ in range(5):
            t0 = time.perf_counter(); jax.block_until_ready(run())
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"W={W:5d}: {t*1e3:7.2f} ms  ({t/(T*L)*1e9:5.1f} ns/executed-step)")

if __name__ == "__main__":
    main()
