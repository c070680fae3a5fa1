"""Standalone shootout of worklist-compaction schemes on TPU.

Given act [n0] bool and capacity C, produce (order [C] i32, valid [C])
with active tiles first in row-major order. Variants:

  argsort : jnp.argsort(~act, stable=True)[:C]        (round-3 scheme)
  scatter : cumsum dest + 1D .at[].set                (naive flags)
  scatteru: same with unique_indices+indices_are_sorted
  search  : searchsorted(cumsum, 1..C) gather form

Each is slope-timed inside a K-frame fori_loop with the act vector
perturbed per step so nothing hoists.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

n0, C = 16384, 6016
rng = np.random.default_rng(0)
act0 = jnp.asarray(rng.random(n0) < 0.34)
x0 = jnp.asarray(rng.uniform(0, 1024, n0).astype(np.float32))


def v_argsort(act):
    order = jnp.argsort(~act, stable=True)[:C]
    return order.astype(jnp.int32), act[order]


def v_scatter(act):
    pos = jnp.cumsum(act.astype(jnp.int32)) - 1
    dest = jnp.where(act, pos, C)
    o1 = jnp.zeros(C, jnp.int32).at[dest].set(
        jnp.arange(n0, dtype=jnp.int32) + 1, mode="drop")
    return jnp.maximum(o1 - 1, 0), o1 > 0


def v_scatteru(act):
    pos = jnp.cumsum(act.astype(jnp.int32)) - 1
    # distinct OOB dests for inactive tiles keep unique_indices honest
    dest = jnp.where(act, pos, C + jnp.arange(n0, dtype=jnp.int32))
    o1 = jnp.zeros(C, jnp.int32).at[dest].set(
        jnp.arange(n0, dtype=jnp.int32) + 1, mode="drop",
        unique_indices=True, indices_are_sorted=False)
    return jnp.maximum(o1 - 1, 0), o1 > 0


def v_search(act):
    cs = jnp.cumsum(act.astype(jnp.int32))
    k = jnp.arange(1, C + 1, dtype=jnp.int32)
    order = jnp.searchsorted(cs, k, side="left").astype(jnp.int32)
    valid = k <= cs[-1]
    return jnp.minimum(order, n0 - 1), valid


def main():
    for name, fn in (("argsort", v_argsort), ("scatter", v_scatter),
                     ("scatteru", v_scatteru), ("search", v_search)):
        def mk(K):
            @jax.jit
            def many(seed):
                def body(k, acc):
                    a = act0 ^ (jnp.arange(n0) == (seed + k) % n0)
                    order, valid = fn(a)
                    return (acc + jnp.sum(x0[order])
                            + valid.sum().astype(jnp.float32))
                return lax.fori_loop(0, K, body, jnp.float32(0.0))
            return many

        def batch(K):
            g = mk(K)
            float(g(jnp.int32(0)))
            best = float("inf")
            for i in range(3):
                t0 = time.perf_counter()
                float(g(jnp.int32(i + 1)))
                best = min(best, time.perf_counter() - t0)
            return best

        t_lo, t_hi = batch(32), batch(128)
        slope = (t_hi - t_lo) / 96
        print(f"{name:9s}: {slope*1e6:8.1f} us/frame")

    # cross-check correctness on host
    a = np.asarray(act0)
    ref_order = np.argsort(~a, kind="stable")[:C]
    for name, fn in (("scatter", v_scatter), ("scatteru", v_scatteru),
                     ("search", v_search)):
        o, v = jax.jit(fn)(act0)
        o, v = np.asarray(o), np.asarray(v)
        na = int(a.sum())
        assert (o[:na] == ref_order[:na]).all(), name
        assert v[:na].all() and not v[na:].any(), name
        print(f"{name}: correct")


if __name__ == "__main__":
    main()
