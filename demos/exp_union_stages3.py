"""Stage bisect of the v3 union frame (violation-fused cull).

Cumulative prefixes at K=256 (dispatch ~0.11 ms/frame amortized):
  cull            plain unrolled interval pass
  cull+viol       with the fused per-word subset test
  +compact        validity routing + per-program ranks + dests
  +scatter        single index scatter + coordinate gathers
  +leaf           all union segments + fallback
  v3 frame        production _frame_union_fn
  full frame      production full-tape frame (reference)

Usage: python demos/exp_union_stages3.py [block_px]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from fidget_tpu.io.models import load_vm_tape
from fidget_tpu.render.region import ImageSize
from fidget_tpu.render.render2d import (
    PixelRenderer,
    _frame_union_fn,
    _frame_unrolled_fn,
    _register_plan,
    _unrolled_cull_stage,
    _unrolled_cull_violation_stage,
    _unrolled_leaf_eval,
    _TAPE_REGISTRY,
)

T0 = 8
N = 1024
K = 256


def timeit(f, mat):
    _ = float(f(mat))
    best = float("inf")
    for i in range(3):
        t0 = time.time()
        _ = float(f(mat * (1.0 + 1e-6 * (i + 1))))
        best = min(best, (time.time() - t0) / K)
    return best * 1e3


def kloop(body):
    def many(mat):
        def b(k, acc):
            m = mat * (1.0 + 1e-7 * k.astype(jnp.float32))
            return acc + body(m)

        return lax.fori_loop(0, K, b, jnp.float32(0.0))

    return jax.jit(many)


def main():
    bpx = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    tape = load_vm_tape("prospero.vm")
    r = PixelRenderer(tape, ImageSize(N, N))
    r.render_unrolled(tile_size=T0, leaf="union", block_px=bpx)
    plan = r._uplans[(T0, bpx)]
    key = id(r.tape)
    n0x = N // T0
    n0 = n0x * n0x
    tx = np.arange(n0x) * T0
    gx, gy = np.meshgrid(tx, tx)
    x0 = jnp.asarray(gx.reshape(-1).astype(np.float32))
    y0 = jnp.asarray(gy.reshape(-1).astype(np.float32))
    mat0 = jnp.asarray(r._mat4(None))
    vec = jnp.zeros(r.n_inputs, jnp.float32)
    z = jnp.float32(0.0)
    tape_, packed, axis_of, nf, cw = _TAPE_REGISTRY[key]

    P = len(plan.programs)
    caps = plan.caps.astype(np.int64)
    base = np.concatenate([[0], np.cumsum(caps)]).astype(np.int64)
    fb_cap = max(128, -(-(n0 // 64) // 128) * 128)
    fb_base = int(base[P])
    total = fb_base + fb_cap
    bp = plan.block_prog
    order_key = np.where(bp < 0, P, bp)
    perm = np.argsort(order_key, kind="stable")
    prog_perm = order_key[perm]
    seg_start = np.searchsorted(prog_perm, np.arange(max(P, 1)))
    safe_prog = np.minimum(prog_perm, max(P - 1, 0))
    seg_start_of_tile = seg_start[safe_prog]
    base_of_tile = base[safe_prog]
    cap_of_tile = caps[safe_prog]
    u_tile = plan.u_packed[np.maximum(bp, 0)]
    uT = jnp.asarray(np.ascontiguousarray(u_tile.T))
    has_prog = bp >= 0

    def cull_body(m):
        ri, ro = _unrolled_cull_stage(
            key, T0, n0, r.n_inputs, x0, y0, m, z, vec, False
        )
        return ri.sum().astype(jnp.float32) + ro.sum()

    def viol_body(m):
        ri, ro, viol = _unrolled_cull_violation_stage(
            key, T0, x0, y0, m, z, vec, uT
        )
        return (
            ri.sum().astype(jnp.float32) + ro.sum() + viol.sum()
        )

    def route_core(m):
        ri, ro, viol = _unrolled_cull_violation_stage(
            key, T0, x0, y0, m, z, vec, uT
        )
        act = ~(ri | ro)
        valid = jnp.asarray(has_prog) & ~viol
        act_p = act[jnp.asarray(perm)]
        valid_p = valid[jnp.asarray(perm)]
        m_own = act_p & valid_p
        c = jnp.cumsum(m_own.astype(jnp.int32))
        c_pad = jnp.concatenate([jnp.zeros(1, jnp.int32), c])
        start_cnt = c_pad[jnp.asarray(seg_start_of_tile)]
        rank = c - 1 - start_cnt
        ok_own = m_own & (rank < jnp.asarray(cap_of_tile))
        dest_own = jnp.asarray(base_of_tile).astype(jnp.int32) + rank
        m_fb = act_p & ~valid_p
        cf = jnp.cumsum(m_fb.astype(jnp.int32)) - 1
        ok_fb = m_fb & (cf < fb_cap)
        ok = ok_own | ok_fb
        dest = jnp.where(ok_own, dest_own, fb_base + cf)
        return act, ok, dest

    def route_body(m):
        act, ok, dest = route_core(m)
        return dest.sum().astype(jnp.float32) + ok.sum()

    def scatter_core(m):
        act, ok, dest = route_core(m)
        dest_u = jnp.where(
            ok, dest, total + jnp.arange(n0, dtype=jnp.int32)
        )
        o1 = (
            jnp.zeros(total, jnp.int32)
            .at[dest_u]
            .set(jnp.asarray(perm, dtype=np.int32) + 1, mode="drop",
                 unique_indices=True)
        )
        vs = o1 > 0
        order = jnp.maximum(o1 - 1, 0)
        return x0[order], y0[order], vs

    def scatter_body(m):
        sx, sy, vs = scatter_core(m)
        return sx.sum() + sy.sum() + vs.sum()

    def leaf_body(m):
        sx, sy, vs = scatter_core(m)
        acc = jnp.float32(0.0)
        for p in range(P):
            sl = slice(int(base[p]), int(base[p + 1]))
            acc = acc + _unrolled_leaf_eval(
                plan.programs[p], axis_of, T0,
                sx[sl], sy[sl], vs[sl], m, z, vec,
            ).sum()
        fl = slice(fb_base, total)
        acc = acc + _unrolled_leaf_eval(
            tape_, axis_of, T0, sx[fl], sy[fl], vs[fl], m, z, vec
        ).sum()
        return acc

    ufn = _frame_union_fn(
        key, _register_plan(plan), T0, n0x, n0x, fb_cap,
        r.n_inputs, False, False,
    )

    def uframe_body(m):
        img2, fill, na, nfb, nov = ufn(x0, y0, m, z, vec)
        return jnp.sum(img2) + na.astype(jnp.float32)

    r.render_unrolled(tile_size=T0)
    cap2 = r._ucap[T0]
    ffn = _frame_unrolled_fn(
        key, T0, n0x, n0x, cap2, r.n_inputs, False, False
    )

    def fframe_body(m):
        d, f, na = ffn(x0, y0, m, z, vec)
        return jnp.sum(d) + na.astype(jnp.float32)

    for name, body in (
        ("cull", cull_body),
        ("cull+viol", viol_body),
        ("+compact", route_body),
        ("+scatter", scatter_body),
        ("+leaf", leaf_body),
        ("v3 frame", uframe_body),
        ("full frame", fframe_body),
    ):
        print(f"{name:12s}: {timeit(kloop(body), mat0):.3f} ms")


if __name__ == "__main__":
    main()
