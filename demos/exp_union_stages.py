"""Stage bisect of the union-leaf frame (why is it slower than full?).

exp_union_leaf.py measured the 256-px union frame at 1.338 ms vs the
full-tape frame's 0.966 ms despite 4.5x less leaf arithmetic. This
times cumulative prefixes of the union pipeline (K-frame loop, forced
via checksums) to locate the regression:

  cull          unrolled interval pass, no capture (sum of rlo)
  capture       interval pass WITH packed choice capture (sum words)
  route         + validity test + per-program compaction (sum dest)
  scatter       + coordinate scatter into slabs
  leaf          + all union leaf segments + fallback segment
  frame         the full frame fn (assembly included)
  leaf-only     leaf segments on FIXED worklists (no cull in program)
  full-leaf-only  full-tape leaf on its fixed worklist (comparison)

Usage: python demos/exp_union_stages.py [block_px]
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
    _register_tape,
    _unrolled_cull_capture_stage,
    _unrolled_cull_stage,
    _unrolled_leaf_eval,
    _TAPE_REGISTRY,
    _PLAN_REGISTRY,
)

T0 = 8
N = 1024
K = 64


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
    img = r.render_unrolled(tile_size=T0, leaf="union", block_px=bpx)
    plan = r._uplans[(T0, bpx)]
    key = id(r.tape)
    n0x = n0y = N // T0
    n0 = n0x * n0y
    tx = np.arange(n0x) * T0
    gx, gy = np.meshgrid(tx, tx)
    x0 = jnp.asarray(gx.reshape(-1).astype(np.float32))
    y0 = jnp.asarray(gy.reshape(-1).astype(np.float32))
    mat0 = jnp.asarray(r._mat4(None))
    vec = jnp.zeros(r.n_inputs, jnp.float32)
    z = jnp.float32(0.0)
    tape_, packed, axis_of, nf, cw = _TAPE_REGISTRY[key]

    # ---- stage prefixes ---------------------------------------------
    def cull_body(m):
        ri, ro = _unrolled_cull_stage(
            key, T0, n0, r.n_inputs, x0, y0, m, z, vec, False
        )
        return ri.sum().astype(jnp.float32) + ro.sum()

    def capture_body(m):
        ri, ro, words = _unrolled_cull_capture_stage(
            key, T0, x0, y0, m, z, vec
        )
        acc = ri.sum().astype(jnp.float32) + ro.sum()
        for w in words:
            acc = acc + (w & 1).sum().astype(jnp.float32)
        return acc

    print(f"cull (no capture): {timeit(kloop(cull_body), mat0):.3f} ms")
    print(f"cull + capture:    {timeit(kloop(capture_body), mat0):.3f} ms")

    # routing + compaction (mirrors _frame_union_fn stages 2-3)
    P = len(plan.programs)
    caps = plan.caps.astype(np.int64)
    base = np.concatenate([[0], np.cumsum(caps)]).astype(np.int64)
    fb_cap = max(128, -(-(n0 // 64) // 128) * 128)
    fb_base = int(base[P])
    total = fb_base + fb_cap
    bp = plan.block_prog
    order_key = np.where(bp < 0, P, bp)
    perm = np.argsort(order_key, kind="stable")
    inv_perm = np.argsort(perm)
    prog_perm = order_key[perm]
    seg_start = np.searchsorted(prog_perm, np.arange(max(P, 1)))
    safe_prog = np.minimum(prog_perm, max(P - 1, 0))
    seg_start_of_tile = seg_start[safe_prog]
    base_of_tile = base[safe_prog]
    cap_of_tile = caps[safe_prog]
    u_tile = plan.u_packed[np.maximum(bp, 0)]
    has_prog = bp >= 0

    def route_core(m):
        ri, ro, words = _unrolled_cull_capture_stage(
            key, T0, x0, y0, m, z, vec
        )
        act = ~(ri | ro)
        valid = jnp.asarray(has_prog)
        for w, tw in enumerate(words):
            uw = jnp.asarray(u_tile[:, w])
            valid = valid & ((tw | uw) == uw)
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

    print(f"+ route/compact:   {timeit(kloop(route_body), mat0):.3f} ms")

    def scatter_core(m):
        act, ok, dest = route_core(m)
        dest_u = jnp.where(
            ok, dest, total + jnp.arange(n0, dtype=jnp.int32)
        )
        x0_p = x0[jnp.asarray(perm)]
        y0_p = y0[jnp.asarray(perm)]
        sx = jnp.zeros(total, jnp.float32).at[dest_u].set(
            x0_p, mode="drop", unique_indices=True)
        sy = jnp.zeros(total, jnp.float32).at[dest_u].set(
            y0_p, mode="drop", unique_indices=True)
        vs = jnp.zeros(total, bool).at[dest_u].set(
            True, mode="drop", unique_indices=True)
        return sx, sy, vs

    def scatter_body(m):
        sx, sy, vs = scatter_core(m)
        return sx.sum() + sy.sum() + vs.sum()

    print(f"+ coord scatter:   {timeit(kloop(scatter_body), mat0):.3f} ms")

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

    print(f"+ leaf segments:   {timeit(kloop(leaf_body), mat0):.3f} ms")

    # the production frames for reference
    ufn = _frame_union_fn(
        key, _register_plan(plan), T0, n0x, n0y, fb_cap,
        r.n_inputs, False, False,
    )

    def uframe_body(m):
        img2, fill, na, nfb, nov = ufn(x0, y0, m, z, vec)
        return jnp.sum(img2) + na.astype(jnp.float32)

    print(f"union frame:       {timeit(kloop(uframe_body), mat0):.3f} ms")

    # isolated leaves on FIXED worklists (the arithmetic floor)
    sx0, sy0, vs0 = scatter_core(mat0)

    def leaf_only_body(m):
        acc = jnp.float32(0.0)
        for p in range(P):
            sl = slice(int(base[p]), int(base[p + 1]))
            acc = acc + _unrolled_leaf_eval(
                plan.programs[p], axis_of, T0,
                sx0[sl], sy0[sl], vs0[sl], m, z, vec,
            ).sum()
        return acc

    print(f"union leaf only:   {timeit(kloop(leaf_only_body), mat0):.3f} ms")

    # full-tape comparison: cull + compact + one leaf (production full)
    r2 = PixelRenderer(tape, ImageSize(N, N))
    img2 = r2.render_unrolled(tile_size=T0)
    cap2 = r2._ucap[T0]
    ffn = _frame_unrolled_fn(
        key, T0, n0x, n0y, cap2, r.n_inputs, False, False
    )

    def fframe_body(m):
        d, f, na = ffn(x0, y0, m, z, vec)
        return jnp.sum(d) + na.astype(jnp.float32)

    print(f"full frame:        {timeit(kloop(fframe_body), mat0):.3f} ms")

    C = cap2
    idx = np.nonzero(np.asarray(~(
        np.asarray(_unrolled_cull_stage(
            key, T0, n0, r.n_inputs, x0, y0, mat0, z, vec, False
        )[0]) | np.asarray(_unrolled_cull_stage(
            key, T0, n0, r.n_inputs, x0, y0, mat0, z, vec, False
        )[1])
    )))[0][:C]
    cx = jnp.asarray(np.asarray(x0)[idx])
    cy = jnp.asarray(np.asarray(y0)[idx])
    cx = jnp.concatenate([cx, jnp.zeros(C - cx.shape[0])])
    cy = jnp.concatenate([cy, jnp.zeros(C - cy.shape[0])])
    vv = jnp.arange(C) < len(idx)

    def full_leaf_only_body(m):
        return _unrolled_leaf_eval(
            tape_, axis_of, T0, cx, cy, vv, m, z, vec
        ).sum()

    print(f"full leaf only:    {timeit(kloop(full_leaf_only_body), mat0):.3f} ms")


if __name__ == "__main__":
    main()
