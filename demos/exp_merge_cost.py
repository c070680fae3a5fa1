"""Isolate the fused-mesh merge core's device costs at round-1 sizes.

Times (K-slope) each piece at kcap=98304, CAP=2.7M:
  gather : qef[rid] for kcap*8 member rows
  shift  : frame shift + dense 8-sum
  probe  : 27-point sign lattice eval (colonnade tape)
  solve  : closed-form QEF solve + err
  dus    : contiguous ext writes
  all    : the real merge core end-to-end
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from fidget_tpu.eval.bulk import BulkEvaluator
from fidget_tpu.io.models import load_vm_tape
from fidget_tpu.mesh.fused import merge_core
from fidget_tpu.mesh.qef import qef_err_c, solve_qef_c

KCAP = 98304
CAP = 294912 * 4 + 5 * KCAP


def slope(f, *args):
    def mk(K):
        @jax.jit
        def many(seed):
            def body(k, acc):
                return acc + f(seed + k, *args)
            return lax.fori_loop(0, K, body, jnp.float32(0.0))
        return many

    def batch(K):
        g = mk(K)
        float(g(jnp.int32(0)))
        best = float("inf")
        for i in range(2):
            t0 = time.perf_counter()
            float(g(jnp.int32(i + 1)))
            best = min(best, time.perf_counter() - t0)
        return best

    return (batch(16) - batch(4)) / 12


def main():
    rng = np.random.default_rng(0)
    qef = jnp.asarray(rng.normal(size=(CAP, 14)).astype(np.float32))
    mvid = jnp.asarray(
        rng.integers(0, 294912 * 4, KCAP * 8).astype(np.int32)
    )

    def f_gather(seed):
        rid = jnp.maximum(mvid + seed * 0, 0)
        return jnp.sum(qef[rid])

    print(f"gather {slope(f_gather)*1e3:7.2f} ms")

    rows = jnp.asarray(
        rng.normal(size=(KCAP * 8, 14)).astype(np.float32)
    )
    t3 = jnp.asarray(rng.normal(size=(KCAP * 8, 3)).astype(np.float32))

    def f_shift(seed):
        tx, ty, tz = t3[:, 0] + seed * 1e-9, t3[:, 1], t3[:, 2]
        a00, a01, a02 = rows[:, 0], rows[:, 1], rows[:, 2]
        a11, a12, a22 = rows[:, 3], rows[:, 4], rows[:, 5]
        b0, b1, b2 = rows[:, 6], rows[:, 7], rows[:, 8]
        at0 = a00 * tx + a01 * ty + a02 * tz
        at1 = a01 * tx + a11 * ty + a12 * tz
        at2 = a02 * tx + a12 * ty + a22 * tz
        out = jnp.stack(
            [a00, a01, a02, a11, a12, a22, b0 + at0, b1 + at1, b2 + at2,
             rows[:, 9] + 2 * (tx * b0 + ty * b1 + tz * b2),
             rows[:, 10], rows[:, 11], rows[:, 12], rows[:, 13]],
            axis=1,
        )
        return jnp.sum(out.reshape(KCAP, 8, 14).sum(axis=1))

    print(f"shift+sum {slope(f_shift)*1e3:7.2f} ms")

    tape = load_vm_tape("colonnade.vm")
    ev = BulkEvaluator(tape)  # for axis_of / n_inputs
    from fidget_tpu.eval.unrolled_fast import eval_tape_float_fast
    from fidget_tpu.mesh.fused import _float_inputs
    pb = jnp.asarray(rng.integers(0, 255, (3, KCAP)).astype(np.int32))
    vv = jnp.zeros(max(1, ev.n_inputs), jnp.float32)

    def f_probe(seed):
        px = (pb[0][None, :] + jnp.arange(27)[:, None]).astype(jnp.float32)
        wx = px * (2.0 / 256) - 1.0 + seed * 1e-9
        wy = wx * 0.99
        wz = wx * 0.98
        out = eval_tape_float_fast(
            ev.tape, _float_inputs(ev, (wx, wy, wz), vv, wx.shape)
        )[0]
        return jnp.sum(out)

    print(f"probe27 {slope(f_probe)*1e3:7.2f} ms")

    mq = jnp.asarray(rng.normal(size=(KCAP, 14)).astype(np.float32))

    def f_solve(seed):
        ata = tuple(mq[:, k] + seed * 0 for k in range(6))
        atb = (mq[:, 6], mq[:, 7], mq[:, 8])
        cnt = jnp.maximum(mq[:, 13], 1.0)
        mass = (mq[:, 10] / cnt, mq[:, 11] / cnt, mq[:, 12] / cnt)
        vx, vy, vz = solve_qef_c(jnp, ata, atb, mass)
        e = qef_err_c(jnp, (vx, vy, vz), ata, atb, mq[:, 9])
        return jnp.sum(vx) + jnp.sum(e)

    print(f"solve {slope(f_solve)*1e3:7.2f} ms")

    def f_dus(seed):
        out = lax.dynamic_update_slice(
            qef, mq, (seed % 4 * KCAP, 0)
        )
        return jnp.sum(out[0])

    print(f"dus {slope(f_dus)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
