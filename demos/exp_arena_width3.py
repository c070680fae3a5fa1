"""interp_float cost vs arena width — device-resident tapes, scalar-forced."""
import os, sys, time, functools, itertools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from fidget_tpu.eval.pallas_interp import interp_float
from demos.exp_interleave import random_tape

def main():
    rng = np.random.default_rng(0)
    T, s0, V, nf, L = 256, 32, 1, 64, 872
    w1r, w2r = random_tape(L, nf, rng)
    vars_ = jnp.asarray(rng.normal(size=(T, V, s0, 128)).astype(np.float32))

    for W in (1024, 4096, 8192):
        w1 = np.zeros((T, W), np.int32); w1[:, :L] = w1r
        w2 = np.zeros((T, W), np.int32); w2[:, :L] = w2r
        d = (jnp.asarray(w1), jnp.asarray(w2),
             jnp.asarray(np.zeros((T, W), np.float32)),
             jnp.asarray(np.full(T, L, np.int32)))

        @jax.jit
        def g(v, eps):
            out = interp_float(*d, v + eps, nf=nf, n_inputs=V,
                               n_outputs=1, s0=s0, interpret=False)
            return jnp.sum(out)

        c = itertools.count(1)
        float(g(vars_, jnp.float32(1e-6)))
        ts = []
        for _ in range(5):
            eps = jnp.float32(next(c) * 1e-6)
            t0 = time.perf_counter()
            float(g(vars_, eps))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"W={W:5d}: {t*1e3:7.2f} ms ({t/(T*L)*1e9:5.1f} ns/step incl dispatch)")

    # amortized: K evals inside one fori, scalar-forced
    W = 8192
    w1 = np.zeros((T, W), np.int32); w1[:, :L] = w1r
    w2 = np.zeros((T, W), np.int32); w2[:, :L] = w2r
    d = (jnp.asarray(w1), jnp.asarray(w2),
         jnp.asarray(np.zeros((T, W), np.float32)),
         jnp.asarray(np.full(T, L, np.int32)))
    K = 16
    @jax.jit
    def many(v, zs):
        def body(i, acc):
            out = interp_float(*d, v + zs[i], nf=nf, n_inputs=V,
                               n_outputs=1, s0=s0, interpret=False)
            return acc + jnp.sum(out)
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
    zs = jnp.arange(K, dtype=jnp.float32) * 1e-6
    float(many(vars_, zs))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        float(many(vars_, zs + (i + 1)))
        ts.append(time.perf_counter() - t0)
    t = min(ts) / K
    print(f"amortized W=8192: {t*1e3:7.2f} ms/eval ({t/(T*L)*1e9:5.1f} ns/step)")

if __name__ == "__main__":
    main()
