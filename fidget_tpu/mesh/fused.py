"""Device-resident octree fine pipeline for Settings(eval="unrolled").

The staged mesh build round-trips the tunnel 13 times (classify per
level, corner signs, edge search, gradients, ...) moving ~30 MB; on
the axon dev tunnel that is ~2.6 s of a 4.8 s depth-8 build. This
module keeps the whole fine stage on device:

- level cores: expand active cells x8, interval-classify the children
  (exact box transform), and compact survivors device-side — only a
  cell COUNT comes back per level (for capacity bucketing);
- leaf core: corner signs for all 8 corners of each leaf cell (no
  host-side corner dedup: re-evaluating shared corners costs ~1 ms of
  VPU time and saves a 3 MB key upload), builds the 8-bit sign mask,
  compacts surface cells;
- edge core: for every (cell, edge) crossing slot, the N-ary
  bisection search, world-space gradients (jax.linearize), QEF
  accumulation into per-(cell, vertex-slot) sums, and the closed-form
  f32 QEF solve (mesh/qef.py) — all in one program.

Capacities are power-of-two buckets; the host syncs one scalar per
stage to pick the next bucket and retries on overflow (same pattern
as the 2D/3D renderers' worklists). Vertex ids are flat `4*cell+slot`
(VERT_COUNT <= 4), so no prefix-sum enumeration is needed anywhere.

Reference behavior being matched: fidget-mesh/src/octree.rs:94-210
(recursive build), :687-767 (edge search); fidget-mesh/src/qef.rs
(truncated solve). The architecture is deliberately different —
level-synchronous worklists and batched XLA programs instead of
per-cell recursion.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..eval.unrolled_fast import eval_tape_float_fast, eval_tape_interval_fast
from .qef import qef_err_c, solve_qef_c
from .tables import CELL_TO_EDGE_TO_VERT, EDGE_AXIS, EDGE_LO, VERT_COUNT

#: packed lattice key stride: coords <= 1024 (depth <= 10) at any level
_KS = 1025

_CORNER_OFF = np.array(
    [[(c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1] for c in range(8)],
    np.int32,
)
_EDGE_HI = EDGE_LO + (1 << EDGE_AXIS)


def _dec(keys):
    """Packed i32 key -> (x, y, z) lattice coords."""
    k = jnp.maximum(keys, 0)
    return k // (_KS * _KS), (k // _KS) % _KS, k % _KS


def _enc(x, y, z):
    return (x * _KS + y) * _KS + z


def _compact_keys(act, keys, cap, extra=None):
    """Stable device compaction of `keys[act]` (row-major order) into
    a [cap] buffer (-1 padding). Returns (out, n_act) and, when
    `extra` (same-shape i32) is given, the compacted extra payload."""
    act = act.reshape(-1)
    keys = keys.reshape(-1)
    n = act.shape[0]
    pos = jnp.cumsum(act.astype(jnp.int32)) - 1
    # culled dests start past n (> any possible pos), so indices are
    # provably unique even when n_act > cap — every out-of-capacity
    # index is dropped by mode="drop" either way
    dest = jnp.where(act, pos, cap + n + jnp.arange(n, dtype=jnp.int32))
    out = (
        jnp.full(cap, -1, jnp.int32)
        .at[dest]
        .set(keys.astype(jnp.int32), mode="drop", unique_indices=True)
    )
    n_act = act.sum()
    if extra is None:
        return out, n_act
    ex = (
        jnp.zeros(cap, jnp.int32)
        .at[dest]
        .set(extra.reshape(-1).astype(jnp.int32), mode="drop",
             unique_indices=True)
    )
    return out, ex, n_act


def _interval_inputs(ev, lo_comps, hi_comps, var_vec_, shape):
    inputs = []
    for i in range(ev.n_inputs):
        c = jnp.broadcast_to(var_vec_[i], shape).astype(jnp.float32)
        inputs.append((c, c))
    for k, kind in enumerate(("x", "y", "z")):
        idx = ev.axis_of.get(kind)
        if idx is not None:
            inputs[idx] = (
                jnp.broadcast_to(lo_comps[k], shape),
                jnp.broadcast_to(hi_comps[k], shape),
            )
    return inputs


def _float_inputs(ev, comps, var_vec_, shape):
    inputs = [
        jnp.broadcast_to(var_vec_[i], shape).astype(jnp.float32)
        for i in range(ev.n_inputs)
    ]
    for k, kind in enumerate(("x", "y", "z")):
        idx = ev.axis_of.get(kind)
        if idx is not None:
            inputs[idx] = jnp.broadcast_to(comps[k], shape)
    return inputs


def _model_pts(mat, wx, wy, wz):
    return tuple(
        mat[r, 0] * wx + mat[r, 1] * wy + mat[r, 2] * wz + mat[r, 3]
        for r in range(3)
    )


def level_core(ev, cin: int, cout: int):
    """Jitted: parents at depth d -> compacted active children at d+1.

    core(keys [cin] i32, n_in, cvec, li, h_child, pos, neg, off3,
         var_vec_) -> (child_keys [cout] i32, n_out, cvec')

    cvec is a small i32 vector threaded through the chain collecting
    per-level counts (cvec' = cvec.at[li].set(n_out)); downloading it
    once replaces an eager jnp.stack that cost two fresh ~0.45 s XLA
    compiles EVERY build on the axon backend."""

    def core(keys, n_in, cvec, li, h_child, pos, neg, off3, var_vec_):
        x, y, z = _dec(keys)
        ox = _CORNER_OFF[:, 0][:, None]
        oy = _CORNER_OFF[:, 1][:, None]
        oz = _CORNER_OFF[:, 2][:, None]
        cx = x[None, :] * 2 + ox  # [8, cin]
        cy = y[None, :] * 2 + oy
        cz = z[None, :] * 2 + oz
        wlo = (
            cx.astype(jnp.float32) * h_child - 1.0,
            cy.astype(jnp.float32) * h_child - 1.0,
            cz.astype(jnp.float32) * h_child - 1.0,
        )
        whi = tuple(w + h_child for w in wlo)
        mlo = tuple(
            pos[r, 0] * wlo[0] + pos[r, 1] * wlo[1] + pos[r, 2] * wlo[2]
            + neg[r, 0] * whi[0] + neg[r, 1] * whi[1] + neg[r, 2] * whi[2]
            + off3[r]
            for r in range(3)
        )
        mhi = tuple(
            pos[r, 0] * whi[0] + pos[r, 1] * whi[1] + pos[r, 2] * whi[2]
            + neg[r, 0] * wlo[0] + neg[r, 1] * wlo[1] + neg[r, 2] * wlo[2]
            + off3[r]
            for r in range(3)
        )
        los, his = eval_tape_interval_fast(
            ev.tape, _interval_inputs(ev, mlo, mhi, var_vec_, cx.shape)
        )
        lo, hi = los[0], his[0]
        live = (jnp.arange(cin)[None, :] < n_in) & (keys[None, :] >= 0)
        act = ~((lo > 0.0) | (hi < 0.0)) & live
        kid = _enc(cx, cy, cz)
        # parent-major flatten keeps spatial (row-major) order stable
        out, n_out = _compact_keys(
            jnp.moveaxis(act, 0, 1), jnp.moveaxis(kid, 0, 1), cout
        )
        return out, n_out, cvec.at[li].set(n_out.astype(jnp.int32))

    return jax.jit(core)


def leaf_core(ev, cl: int, cs: int):
    """Jitted: leaf cells -> compacted surface cells with sign masks.

    core(keys [cl] i32, n_leaf, cvec, li, h, mat, var_vec_)
      -> (surf_keys [cs], surf_mask [cs], n_surf, cvec')
    where cvec is the per-level count vector and li the level index;
    the returned cvec' has cvec[li] updated to n_surf.
    """

    def core(keys, n_leaf, cvec, li, h, mat, var_vec_):
        x, y, z = _dec(keys)
        ox = _CORNER_OFF[:, 0][:, None]
        oy = _CORNER_OFF[:, 1][:, None]
        oz = _CORNER_OFF[:, 2][:, None]
        wx = (x[None, :] + ox).astype(jnp.float32) * h - 1.0  # [8, cl]
        wy = (y[None, :] + oy).astype(jnp.float32) * h - 1.0
        wz = (z[None, :] + oz).astype(jnp.float32) * h - 1.0
        mx, my, mz = _model_pts(mat, wx, wy, wz)
        out = eval_tape_float_fast(
            ev.tape, _float_inputs(ev, (mx, my, mz), var_vec_, wx.shape)
        )[0]
        inside = (out < 0.0).astype(jnp.int32)
        mask = (inside << jnp.arange(8, dtype=jnp.int32)[:, None]).sum(0)
        live = (jnp.arange(cl) < n_leaf) & (keys >= 0)
        surf = live & (mask != 0) & (mask != 255)
        out_k, out_m, n_surf = _compact_keys(surf, keys, cs, extra=mask)
        return out_k, out_m, n_surf, cvec.at[li].set(
            n_surf.astype(jnp.int32)
        )

    return jax.jit(core)


def edges_core(ev, cmax: int, cs: int, rounds: int, samples: int):
    """Jitted: surface cells -> per-(cell, vertex-slot) QEF data.

    Every (cell, edge) crossing slot runs the N-ary bisection and a
    gradient evaluation densely ([cs, 12] lanes, masked); results
    reduce 12 -> 4 vertex slots through the CELL_TO_EDGE_TO_VERT
    table with pure selects (no scatter in the whole program).

    core(surf_keys [cs], surf_mask [cs], h, mat, var_vec_) -> dict of
      qef:  [cs, 4, 14] f32 (a00,a01,a02,a11,a12,a22, b0,b1,b2, btb,
                             sx,sy,sz, cnt)
      vpos: [cs, 4, 3] f32 world positions (QEF-solved, cell-clamped)
      verr: [cs, 4] f32 residuals
    """
    lv_tab = jnp.asarray(CELL_TO_EDGE_TO_VERT.astype(np.int32))  # [256,12]
    lo_tab = jnp.asarray(EDGE_LO.astype(np.int32))
    hi_tab = jnp.asarray(_EDGE_HI.astype(np.int32))
    coff = jnp.asarray(_CORNER_OFF)

    def core(surf_keys, surf_mask, h, mat, var_vec_):
        # inputs arrive at the level-worklist size [cmax]; the static
        # slice to [cs] lives INSIDE the jit so no eager slice op pays
        # a tunnel round trip
        surf_keys = surf_keys[:cs]
        surf_mask = surf_mask[:cs]
        x, y, z = _dec(surf_keys)
        mask = surf_mask
        # EDGE-MAJOR [12, cs] layout throughout: cells ride the dense
        # 128-lane minor axis; a [cs, 12] layout put 12 on the minor
        # dim (90% lane waste — measured ~750 ms of device time where
        # this form costs ~100)
        lv = lv_tab[mask].T                    # [12, cs]
        crossing = (lv >= 0) & (surf_keys >= 0)[None, :]
        lo_c = jnp.broadcast_to(lo_tab[:, None], (12, cs))
        hi_c = jnp.broadcast_to(hi_tab[:, None], (12, cs))
        lo_in = (mask[None, :] >> lo_c) & 1
        start_c = jnp.where(lo_in == 1, lo_c, hi_c)
        end_c = jnp.where(lo_in == 1, hi_c, lo_c)

        def corner_pos(c):
            return (
                (x[None, :] + coff[c, 0]).astype(jnp.float32) * h - 1.0,
                (y[None, :] + coff[c, 1]).astype(jnp.float32) * h - 1.0,
                (z[None, :] + coff[c, 2]).astype(jnp.float32) * h - 1.0,
            )

        sx, sy, sz = corner_pos(start_c)       # [12, cs] world
        ex, ey, ez = corner_pos(end_c)
        dx, dy, dz = ex - sx, ey - sy, ez - sz

        frac = (
            (jnp.arange(samples, dtype=jnp.float32) + 1.0) / (samples + 1.0)
        )[:, None, None]

        def fdist(wx, wy, wz):
            mx, my, mz = _model_pts(mat, wx, wy, wz)
            return eval_tape_float_fast(
                ev.tape, _float_inputs(ev, (mx, my, mz), var_vec_, wx.shape)
            )[0]

        def round_(_, carry):
            ta, tb = carry
            ts = ta[None] + (tb - ta)[None] * frac   # [S, 12, cs]
            out = fdist(
                sx[None] + dx[None] * ts,
                sy[None] + dy[None] * ts,
                sz[None] + dz[None] * ts,
            )
            outside = ~(out < 0.0)
            any_out = outside.any(axis=0)
            F = jnp.argmax(outside, axis=0).astype(jnp.float32)
            span = tb - ta
            tbF = ta + span * (F + 1.0) / (samples + 1.0)
            taF = ta + span * F / (samples + 1.0)
            ts_last = ta + span * samples / (samples + 1.0)
            new_tb = jnp.where(any_out, tbF, tb)
            new_ta = jnp.where(
                any_out & (F > 0), taF,
                jnp.where(any_out, ta, ts_last),
            )
            return new_ta, new_tb

        ta0 = jnp.zeros((12, cs), jnp.float32)
        tb0 = jnp.ones((12, cs), jnp.float32)
        ta, tb = jax.lax.fori_loop(0, rounds, round_, (ta0, tb0))
        t = 0.5 * (ta + tb)
        ipx, ipy, ipz = sx + dx * t, sy + dy * t, sz + dz * t

        # world gradients: one primal + three tangent pulls
        _, flin = jax.linearize(fdist, ipx, ipy, ipz)
        one = jnp.ones_like(ipx)
        zero = jnp.zeros_like(ipx)
        gx = flin(one, zero, zero)
        gy = flin(zero, one, zero)
        gz = flin(zero, zero, one)
        fin = jnp.isfinite(gx) & jnp.isfinite(gy) & jnp.isfinite(gz)
        gn = jnp.sqrt(gx * gx + gy * gy + gz * gz)
        w_ok = crossing & fin & (gn > 1e-20)
        inv = jnp.where(w_ok, 1.0 / jnp.where(gn == 0, 1.0, gn), 0.0)
        nx, ny, nz = gx * inv, gy * inv, gz * inv

        # QEF accumulation in the CELL-LOCAL frame (origin = the
        # cell's lo corner): in the world frame the f32 residual
        # v'Av - 2b.v + btb is pure cancellation noise (~eps * |p|^2 *
        # count), which rejected every flat-region merge; with |p_rel|
        # <= h the noise floor drops below the 1e-10 accept threshold.
        # Merging shifts member QEFs into the parent frame
        # (DeviceVertexStore), which is exact in exact arithmetic.
        clo = (
            x.astype(jnp.float32) * h - 1.0,   # [cs]
            y.astype(jnp.float32) * h - 1.0,
            z.astype(jnp.float32) * h - 1.0,
        )
        rpx = ipx - clo[0][None, :]
        rpy = ipy - clo[1][None, :]
        rpz = ipz - clo[2][None, :]
        bw = nx * rpx + ny * rpy + nz * rpz

        # 12 -> 4 vertex-slot reduction with selects, slot-major [4, cs]
        def slot_sum(val, need_w=False):
            m = w_ok if need_w else crossing
            v = jnp.where(m, val, 0.0)
            return jnp.stack(
                [jnp.where(lv == k, v, 0.0).sum(axis=0) for k in range(4)],
                axis=0,
            )  # [4, cs]

        comps = [
            slot_sum(nx * nx, True), slot_sum(nx * ny, True),
            slot_sum(nx * nz, True), slot_sum(ny * ny, True),
            slot_sum(ny * nz, True), slot_sum(nz * nz, True),
            slot_sum(nx * bw, True), slot_sum(ny * bw, True),
            slot_sum(nz * bw, True), slot_sum(bw * bw, True),
            slot_sum(rpx), slot_sum(rpy), slot_sum(rpz),
            slot_sum(jnp.ones_like(ipx)),
        ]

        cnt = comps[13]
        massd = jnp.maximum(cnt, 1.0)
        m3 = (comps[10] / massd, comps[11] / massd, comps[12] / massd)
        ata = tuple(comps[k] for k in range(6))
        atb = (comps[6], comps[7], comps[8])
        vx, vy, vz = solve_qef_c(jnp, ata, atb, m3)
        vx = jnp.clip(vx, 0.0, h)
        vy = jnp.clip(vy, 0.0, h)
        vz = jnp.clip(vz, 0.0, h)
        verr = qef_err_c(jnp, (vx, vy, vz), ata, atb, comps[9])
        # one relayout at the very end: slot-major [4, cs, *] ->
        # flat id-ordered [(cs + ext) * 4, *] (ids are 4*cell + slot),
        # pre-padded with the collapse extension region so the vertex
        # store never needs an eager reshape/concat (each eager device
        # op costs a ~20 ms tunnel RPC)
        ext = cs  # covers sum of per-round candidate slabs (< cs/3)
        qef = jnp.pad(
            jnp.stack(comps, axis=2).transpose(1, 0, 2).reshape(cs * 4, 14),
            ((0, ext), (0, 0)),
        )
        vpos = jnp.pad(
            jnp.stack(
                [vx + clo[0][None, :], vy + clo[1][None, :],
                 vz + clo[2][None, :]], axis=2,
            ).transpose(1, 0, 2).reshape(cs * 4, 3),
            ((0, ext), (0, 0)),
        )
        vorig = jnp.pad(
            jnp.stack(
                [jnp.broadcast_to(c[None, :], (4, cs)) for c in clo],
                axis=2,
            ).transpose(1, 0, 2).reshape(cs * 4, 3),
            ((0, ext), (0, 0)),
        )
        verr_f = jnp.pad(verr.T.reshape(cs * 4), (0, ext))
        return {"qef": qef, "vpos": vpos, "verr": verr_f,
                "vorig": vorig}

    return jax.jit(core)


def _bucket_pow2(n: int, lo: int = 1024) -> int:
    return max(lo, 1 << max(0, int(n - 1).bit_length()))


def _bucket_half(n: int, lo: int = 256) -> int:
    """Power-of-two bucket with 3/4 half-steps (<= 33% padding)."""
    p = _bucket_pow2(n, lo)
    if p * 3 // 4 >= max(n, lo):
        return p * 3 // 4
    return p


def _core_cache(ev):
    return ev.__dict__.setdefault("_fused_cores", {})


def _get_core(ev, kind, build, *shape_key):
    cache = _core_cache(ev)
    key = (kind,) + shape_key
    if key not in cache:
        cache[key] = build()
    return cache[key]


def fine_stage(ev, m, var_vec, depth, *, rounds, samples, cancel=None,
               clock=None):
    """Runs the device-resident fine pipeline.

    Returns (cells [N,3] i64, mask [N] i32, qef/vpos/verr device
    arrays shaped [cs, 4, ...], n_surf) — the device arrays stay
    resident; callers slice/gather what they need.
    """
    from ..render.config import check_cancel

    A = m[:3, :3].astype(np.float32)
    pos = jnp.asarray(np.maximum(A, 0.0))
    neg = jnp.asarray(np.minimum(A, 0.0))
    off3 = jnp.asarray(m[:3, 3].astype(np.float32))
    mat = jnp.asarray(m[:3, :].astype(np.float32))
    vv = jnp.asarray(_padded_vars(ev, var_vec))

    d0 = min(3, depth - 1)
    g0 = np.arange(1 << d0, dtype=np.int32)
    gx, gy, gz = np.meshgrid(g0, g0, g0, indexing="ij")
    keys_np = (
        (gx.astype(np.int64) * _KS + gy) * _KS + gz
    ).reshape(-1).astype(np.int32)
    n_seed = len(keys_np)

    # ONE worklist capacity for every level (the level core compiles
    # once; early levels waste lanes, which is device-arithmetic noise
    # compared to one extra XLA compile). Surface cells are bounded by
    # active leaves, so the leaf/edges cores share the same bucket.
    cap_cache = ev.__dict__.setdefault("_fused_caps", {})
    G = 1 << depth
    cmax = cap_cache.get(
        ("cmax", depth), _bucket_pow2(max(n_seed, 8 * G * G))
    )

    # speculative mode: once a capacity is cached for this (tape,
    # depth), queue every level + the leaf pass WITHOUT forcing the
    # per-level counts — the whole chain dispatches asynchronously and
    # the host syncs once at the end (~90 ms of tunnel latency per
    # level otherwise). Overflow is detected from the synced counts
    # and falls back to the checked path with a bigger bucket.
    h = 2.0 / (1 << depth)
    speculative = ("cmax", depth) in cap_cache

    def run_chain(cmax, checked):
        keys0 = np.full(cmax, -1, np.int32)
        keys0[:n_seed] = keys_np
        keys = jnp.asarray(keys0)
        n_in = jnp.int32(n_seed)
        n_lv = depth - d0
        cvec = jnp.asarray(np.zeros(n_lv + 1, np.int32))
        for i, d in enumerate(range(d0, depth)):
            check_cancel(cancel)
            h_child = 2.0 / (1 << (d + 1))
            core = _get_core(
                ev, "level", lambda: level_core(ev, cmax, cmax), cmax
            )
            keys, n_out, cvec = core(
                keys, n_in, cvec, jnp.int32(i), jnp.float32(h_child),
                pos, neg, off3, vv,
            )
            if checked:
                n = int(n_out)
                if n > cmax:
                    return None, n
                if clock is not None:
                    clock.tick(f"classify d={d + 1} ({n} active)")
                if n == 0:
                    return "empty", 0
            n_in = n_out
        lcore = _get_core(
            ev, "leaf", lambda: leaf_core(ev, cmax, cmax), cmax
        )
        surf_keys, surf_mask, n_surf, cvec = lcore(
            keys, n_in, cvec, jnp.int32(n_lv), jnp.float32(h), mat, vv
        )
        if not checked:
            # one sync for the whole chain (single count-vector pull)
            cn = [int(c) for c in np.asarray(cvec)]
            if max(cn) > cmax:
                return None, max(cn)
            if clock is not None:
                clock.tick(
                    "classify chain (" +
                    "/".join(str(c) for c in cn[:-1]) +
                    f" active, {cn[-1]} surface)"
                )
            if 0 in cn[:-1]:
                return "empty", 0
            ns_here = cn[-1]
        else:
            ns_here = int(n_surf)
            if clock is not None:
                clock.tick(f"corner masks ({ns_here} surface)")
        return (surf_keys, surf_mask, ns_here), ns_here

    while True:
        r, n = run_chain(cmax, checked=not speculative)
        if r is not None:
            break
        speculative = False
        cmax = _bucket_pow2(n)  # overflow: retry with the real count
    cap_cache[("cmax", depth)] = cmax
    if r == "empty":
        return None
    surf_keys, surf_mask, ns = r
    if ns == 0:
        return None
    # right-size the surface worklist: the edges core is the most
    # expensive program in the build ([12, cs] dense bisection), so a
    # half-step bucket (<= 33% padding) instead of cmax (~2x) matters;
    # the slice to cs happens inside the core
    cs_cap = min(cmax, max(
        cap_cache.get(("cs", depth), 0), _bucket_half(ns, lo=1024)
    ))
    cap_cache[("cs", depth)] = cs_cap

    check_cancel(cancel)
    ecore = _get_core(
        ev, "edges",
        lambda: edges_core(ev, cmax, cs_cap, rounds, samples),
        cmax, cs_cap, rounds, samples,
    )
    res = ecore(surf_keys, surf_mask, jnp.float32(h), mat, vv)

    # host copies of the cell list (needed for the walk either way)
    sk = np.asarray(surf_keys)[:ns].astype(np.int64)
    mk = np.asarray(surf_mask)[:ns].astype(np.int32)
    cells = np.stack(
        [sk // (_KS * _KS), (sk // _KS) % _KS, sk % _KS], axis=1
    )
    if clock is not None:
        clock.tick(f"edge solve ({ns} cells)")
    return cells, mk, res, ns, cs_cap


def _padded_vars(ev, var_vec):
    vv = np.zeros(max(1, ev.n_inputs), np.float32)
    if var_vec is not None:
        vv[: len(var_vec)] = np.asarray(var_vec, np.float32)
    return vv


# ----------------------------------------------------------------------
# device-resident collapse support


def merge_core(ev, mcap: int, kcap: int):
    """Jitted collapse round: merged QEF solve + 27-point topology
    probe, with the per-vertex store arrays staying on device.

    core(qef [CAP,14], vpos [CAP,3], verr [CAP], vorig [CAP,3],
         mvid [kcap*8] i32 dense member table (-1 padding),
         pb3 [3, kcap] i32, ps i32, h, mat, var_vec_, ext_base i32)
      -> (qef', vpos', verr', vorig', packed [kcap, 6] f32)

    packed columns: topo, merged position xyz, merr, cerr + f32 noise
    tolerance. Rows for ALL kcap candidates are written at the
    contiguous ext slab ext_base..ext_base+kcap; the host references
    only the accepted ids. (mcap is unused, kept for cache-key shape.)"""
    from .collapse import (
        _CENTER_LAT,
        _CORNER_LAT,
        _EDGE_CHECKS,
        _FACE_CHECKS,
        _LATTICE,
    )

    lat = jnp.asarray(_LATTICE.astype(np.int32))          # [27, 3]
    vc_tab = jnp.asarray(VERT_COUNT.astype(np.int32))     # [256]

    def core(qef, vpos, verr, vorig, mvid, pb3, ps, h, mat,
             var_vec_, ext_base):
        # mvid: [kcap * 8] dense member table (slot-major: candidate
        # k's members at k*8..k*8+7, -1 padding) — the 12->4-style
        # dense reduction again, because a segment_sum scatter-add over
        # ~600k rows serialized to ~1 s on TPU where this is pure
        # gather + axis-sum
        valid = mvid >= 0
        rid = jnp.maximum(mvid, 0)
        rows = jnp.where(valid[:, None], qef[rid], 0.0)  # [kcap*8, 14]
        segc = jnp.arange(kcap * 8, dtype=jnp.int32) // 8
        psf = ps.astype(jnp.float32)
        lo = tuple(pb3[k].astype(jnp.float32) * h - 1.0 for k in range(3))

        # shift each member QEF from its own cell frame into the
        # parent frame (exact translation covariance: AtA fixed,
        # Atb += AtA t, btb += 2 t.Atb + t'AtA t, msum += cnt t)
        org = jnp.where(valid[:, None], vorig[rid], 0.0)  # [kcap*8, 3]
        tx = org[:, 0] - lo[0][segc]
        ty = org[:, 1] - lo[1][segc]
        tz = org[:, 2] - lo[2][segc]
        a00, a01, a02 = rows[:, 0], rows[:, 1], rows[:, 2]
        a11, a12, a22 = rows[:, 3], rows[:, 4], rows[:, 5]
        b0, b1, b2 = rows[:, 6], rows[:, 7], rows[:, 8]
        at0 = a00 * tx + a01 * ty + a02 * tz
        at1 = a01 * tx + a11 * ty + a12 * tz
        at2 = a02 * tx + a12 * ty + a22 * tz
        nb0, nb1, nb2 = b0 + at0, b1 + at1, b2 + at2
        nbtb = (
            rows[:, 9]
            + 2.0 * (tx * b0 + ty * b1 + tz * b2)
            + (tx * at0 + ty * at1 + tz * at2)
        )
        cntm = rows[:, 13]
        rows = jnp.stack(
            [a00, a01, a02, a11, a12, a22, nb0, nb1, nb2, nbtb,
             rows[:, 10] + cntm * tx, rows[:, 11] + cntm * ty,
             rows[:, 12] + cntm * tz, cntm],
            axis=1,
        )
        mqef = rows.reshape(kcap, 8, 14).sum(axis=1)
        cerr = (
            jnp.where(valid, verr[rid], 0.0).reshape(kcap, 8).sum(axis=1)
        )
        ata = tuple(mqef[:, k] for k in range(6))
        atb = (mqef[:, 6], mqef[:, 7], mqef[:, 8])
        btb = mqef[:, 9]
        cnt = jnp.maximum(mqef[:, 13], 1.0)
        mass = (mqef[:, 10] / cnt, mqef[:, 11] / cnt, mqef[:, 12] / cnt)
        vx, vy, vz = solve_qef_c(jnp, ata, atb, mass)
        vx = jnp.clip(vx, 0.0, psf * h)
        vy = jnp.clip(vy, 0.0, psf * h)
        vz = jnp.clip(vz, 0.0, psf * h)
        merr = qef_err_c(jnp, (vx, vy, vz), ata, atb, btb)
        # f32 cancellation floor of the residual, returned so the
        # accept test can discount it (scales with the largest term)
        tol = 2.4e-7 * jnp.abs(btb)

        # 27-point sign lattice, lattice index on the sublane axis
        half = ps // 2
        px = pb3[0][None, :] + lat[:, 0][:, None] * half  # [27, kcap]
        py = pb3[1][None, :] + lat[:, 1][:, None] * half
        pz = pb3[2][None, :] + lat[:, 2][:, None] * half
        wx = px.astype(jnp.float32) * h - 1.0
        wy = py.astype(jnp.float32) * h - 1.0
        wz = pz.astype(jnp.float32) * h - 1.0
        mx, my, mz = _model_pts(mat, wx, wy, wz)
        out = eval_tape_float_fast(
            ev.tape, _float_inputs(ev, (mx, my, mz), var_vec_, wx.shape)
        )[0]
        inside = out < 0.0                                # [27, kcap]
        corner = inside[np.asarray(_CORNER_LAT)]          # [8, kcap]
        pmask = (
            corner.astype(jnp.int32)
            << jnp.arange(8, dtype=jnp.int32)[:, None]
        ).sum(0)
        topo = vc_tab[pmask] == 1
        for mid, a, b in _EDGE_CHECKS:
            topo &= (inside[mid] == inside[a]) | (inside[mid] == inside[b])
        for row in _FACE_CHECKS:
            mid, quad = int(row[0]), row[1:]
            hit = jnp.zeros_like(topo)
            for q in quad:
                hit |= inside[mid] == inside[int(q)]
            topo &= hit
            c0, c1, c2, c3 = (inside[int(q)] for q in quad)
            topo &= ~((c0 == c3) & (c1 == c2) & (c0 != c1))
        center_hit = jnp.zeros_like(topo)
        for c in range(8):
            center_hit |= inside[int(_CENTER_LAT)] == corner[c]
        topo &= center_hit

        # the ext region write is one contiguous slab: dynamic_update_
        # slice is a pure DMA where a 98k-row .at[ids].set scatter
        # serialized (~1 s of the s=1 round)
        mvg = jnp.stack([vx + lo[0], vy + lo[1], vz + lo[2]], axis=1)
        dus = jax.lax.dynamic_update_slice
        qef = dus(qef, mqef, (ext_base, 0))
        vpos = dus(vpos, mvg, (ext_base, 0))
        verr = dus(verr, merr, (ext_base,))
        vorig = dus(vorig, jnp.stack(lo, axis=1), (ext_base, 0))
        # one packed download: topo, merged position, merr, cerr+tol
        packed = jnp.concatenate(
            [topo.astype(jnp.float32)[:, None], mvg,
             merr[:, None], (cerr + tol)[:, None]], axis=1,
        )
        return qef, vpos, verr, vorig, packed

    return jax.jit(core)


class DeviceVertexStore:
    """Collapse vertex store with all per-vertex data device-resident.

    Fine vertices occupy flat ids 4*cell + slot (matching the fused
    fine stage's [cs, 4] layout); merged vertices append into an
    extension region. Per round only (topo, mv, merr, cerr) — a few
    hundred KB — cross the tunnel; the QEF sums never leave the device.
    """

    def __init__(self, ev, m, var_vec, h, res, cs_cap, depth):
        self.ev = ev
        self.h = float(h)
        self.depth = depth
        self.mat = jnp.asarray(m[:3, :].astype(np.float32))
        self.vv = jnp.asarray(_padded_vars(ev, var_vec))
        # arrays arrive flat and pre-padded from the edges core — zero
        # eager device ops here
        self.cap = int(res["verr"].shape[0])
        self.qef = res["qef"]
        self.vpos = res["vpos"]
        self.verr = res["verr"]
        self.vorig = res["vorig"]
        self.ext_base = cs_cap * 4
        self.kcap = None

    def _ensure_ext(self, need):
        """Grows the extension region in slabs; array length changes
        recompile the merge core (rare: slabs cover whole builds)."""
        if self.ext_base + need <= self.cap:
            return
        ext = max(need, self.cap // 2)
        self.qef = jnp.concatenate(
            [self.qef, jnp.zeros((ext, 14), jnp.float32)]
        )
        self.vpos = jnp.concatenate(
            [self.vpos, jnp.zeros((ext, 3), jnp.float32)]
        )
        self.verr = jnp.concatenate(
            [self.verr, jnp.zeros(ext, jnp.float32)]
        )
        self.vorig = jnp.concatenate(
            [self.vorig, jnp.zeros((ext, 3), jnp.float32)]
        )
        self.cap += ext

    def merge_round(self, member_vids, seg_member, pbase, ps):
        K = len(pbase)
        M = len(member_vids)
        # per-round half-step buckets: uploads/downloads are sized to
        # the round (round 1 dominates; later rounds reuse small cores)
        kcap = _bucket_half(K)
        self._ensure_ext(kcap)
        # dense member table [kcap, 8]: <= 8 same-size members/parent
        starts = np.searchsorted(seg_member, np.arange(K))
        slot = np.arange(M) - starts[seg_member]
        mv_p = np.full(kcap * 8, -1, np.int32)
        mv_p[seg_member * 8 + slot] = member_vids
        pb_p = np.zeros((3, kcap), np.int32)
        pb_p[:, :K] = pbase.T
        core = _get_core(
            self.ev, "merge",
            lambda: merge_core(self.ev, 0, kcap),
            kcap, self.cap,
        )
        (self.qef, self.vpos, self.verr, self.vorig, packed) = core(
            self.qef, self.vpos, self.verr, self.vorig,
            jnp.asarray(mv_p),
            jnp.asarray(pb_p), jnp.int32(ps), jnp.float32(self.h),
            self.mat, self.vv, jnp.int32(self.ext_base),
        )
        self._last = (self.ext_base, kcap)
        self.ext_base += kcap
        p = np.asarray(packed)[:K].astype(np.float64)
        return p[:, 0] > 0.5, p[:, 1:4], p[:, 4], p[:, 5]

    def commit(self, accept):
        base, _ = self._last
        return base + np.nonzero(accept)[0]

    def final_positions(self, ids):
        u = len(ids)
        ucap = _bucket_pow2(max(1, u), 256)
        idp = np.zeros(ucap, np.int32)
        idp[:u] = ids
        out = np.asarray(self.vpos[jnp.asarray(idp)])
        return out[:u].astype(np.float32)
