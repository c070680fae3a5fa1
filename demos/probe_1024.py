"""Stage-isolation probe for the 1024^3 strata crash.

The full strata scan at 1024^3 (tile=64, sub=16) kills the TPU worker
(kernel fault) even at cap=4096, while 512^3 with identical kernel
shapes works. Root + simplify pass fine at 1024^3. This script runs
ONE stratum's stages as SEPARATE dispatches with progress prints, so
the faulting stage is identifiable from where the output stops.

Usage: python demos/probe_1024.py [n]   (n = volume edge, default 1024)
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from fidget_tpu.eval.arith import IntervalMode
from fidget_tpu.eval.pallas_interp import (
    interp_interval,
    interp_voxel_depth,
)
from fidget_tpu.eval.simplify_device import DeviceSimplifier, DynamicSimplifier
from fidget_tpu.render.region import VoxelSize
from fidget_tpu.render.render3d import VoxelRenderer
from fidget_tpu.shape import Shape, Tree


def main(n=1024, cap=4096):
    x, y, z = Tree.axes()
    s = 4.0
    g = (
        (x * s).sin() * (y * s).cos()
        + (y * s).sin() * (z * s).cos()
        + (z * s).sin() * (x * s).cos()
    )
    shape = Shape.from_tree(
        (abs(g) - 0.2).max(
            (x.square() + y.square() + z.square()).sqrt() - 0.8
        )
    )
    r = VoxelRenderer(shape.tape(), VoxelSize(n, n, n), cap=cap)
    matM = jnp.asarray(np.eye(4, dtype=np.float32))
    vec = jnp.zeros(r.n_inputs, jnp.float32)
    x0 = jnp.asarray(r.tile_x0)
    y0 = jnp.asarray(r.tile_y0)
    z0 = jnp.asarray(r.tile_z0)

    def stage(name, f, *a):
        t0 = time.perf_counter()
        out = jax.jit(f)(*a) if callable(f) else f
        out = jax.tree.map(
            lambda v: v.block_until_ready() if hasattr(v, "block_until_ready") else v,
            out,
        )
        # force a real fetch (block_until_ready is unreliable over the tunnel)
        leaves = jax.tree.leaves(out)
        _ = np.asarray(leaves[0]).ravel()[:1] if leaves else None
        print(f"{name}: ok {time.perf_counter()-t0:.1f}s", flush=True)
        return out

    rlo, rhi, packed_choices = stage(
        "root",
        lambda m, v: r._frame_tiles(
            m, v, x0, y0, z0, mode="heightmap", cap=r.cap,
            stop_after="root",
        ),
        matM, vec,
    )
    nt = r.nt
    root_full = np.asarray(rhi).reshape(-1)[:nt] < 0.0
    root_active = ~(root_full | (np.asarray(rlo).reshape(-1)[:nt] > 0.0))

    w1s, w2s, lens = stage(
        "simplify",
        lambda m, v: r._frame_tiles(
            m, v, x0, y0, z0, mode="heightmap", cap=r.cap,
            stop_after="simplify",
        ),
        matM, vec,
    )
    imms = jnp.zeros_like(w1s)  # placeholder if imms unavailable
    # pull the real imms via the simplifier (same call _frame_tiles makes)
    w1s, w2s, imms, lens, _ = jax.jit(
        lambda pc: r.simplifier.simplify_packed(
            pc, n_tiles=nt, interpret=r.interpret
        )
    )(packed_choices)
    print("simplify(imms): ok", flush=True)

    # ---- stratum 0 (nearest = largest z) ---------------------------------
    ts, sub, nl = r.ts, r.sub, r.nl
    ntxy = r.nty * r.ntx
    ny2 = r.nty * nl
    nsub_s = nl * ny2 * r.nx2
    cap_s = min(r.cap, nsub_s)
    m = r.m
    im = IntervalMode(jnp)
    mat = matM @ jnp.asarray(r.s2w, jnp.float32)

    sl = slice((r.ntz - 1) * ntxy, r.ntz * ntxy)  # nearest slab
    x0s, y0s, z0s = x0[sl], y0[sl], z0[sl]
    acts = jnp.asarray(root_active[sl])[:, None]
    w1p, w2p, immp = w1s[sl], w2s[sl], imms[sl]
    lens1 = jnp.where(jnp.asarray(root_active[sl]), lens[sl], 0)

    sub_dx = jnp.asarray(r.sub_dx)
    sub_dy = jnp.asarray(r.sub_dy)
    sub_dz = jnp.asarray(r.sub_dz)

    def subtile_pass(w1p, w2p, immp, lens1, x0s, y0s, z0s, vec):
        sx0 = x0s[:, None] + sub_dx[None, :]
        sy0 = y0s[:, None] + sub_dy[None, :]
        sz0 = z0s[:, None] + sub_dz[None, :]
        var_lo1, var_hi1 = r._interval_vars(
            im, mat, vec,
            (sx0, sx0 + sub), (sy0, sy0 + sub), (sz0, sz0 + sub),
            r.s0s, (ntxy,),
        )
        return interp_interval(
            w1p, w2p, immp, lens1, var_lo1, var_hi1,
            nf=r.nf, n_inputs=r.n_inputs, n_outputs=1,
            s0=r.s0s, c_words=r.c_words, interpret=r.interpret,
            op_order=r.op_order,
        )

    olo1, ohi1, choices1 = stage(
        "subtile interval", subtile_pass,
        w1p, w2p, immp, lens1, x0s, y0s, z0s, vec,
    )

    slo = np.asarray(olo1[:, 0]).reshape(ntxy, -1)[:, :m]
    shi = np.asarray(ohi1[:, 0]).reshape(ntxy, -1)[:, :m]
    acts_np = np.asarray(acts)
    sub_active = acts_np & ~(shi < 0.0) & ~(slo > 0.0)
    print("active subtiles in stratum 0:", int(sub_active.sum()), flush=True)

    perlane = stage(
        "codes",
        lambda w1, w2, ln, ch: DynamicSimplifier.codes(
            w1, w2, ln, ch, nf=r.nf, interpret=r.interpret,
            op_order=r.op_order,
        ),
        w1p, w2p, lens1, choices1,
    )

    # compact exactly as the stratum body does
    g2 = sub_active.reshape(r.nty, r.ntx, nl, nl, nl)
    active_d = g2.transpose(2, 0, 3, 1, 4).reshape(nl, ny2, r.nx2)
    act_flat = active_d.reshape(-1)
    lz_f = np.arange(nsub_s, dtype=np.int32) // (ny2 * r.nx2)
    key = np.where(act_flat, nl - lz_f, 1 << 30)
    order = np.argsort(key, kind="stable")[:cap_s]
    valid = act_flat[order]
    lz = order // (ny2 * r.nx2)
    rem = order % (ny2 * r.nx2)
    gy = rem // r.nx2
    gx = rem % r.nx2
    t_idx = (gy // nl) * r.ntx + (gx // nl)
    k_local = ((lz % nl) * nl + (gy % nl)) * nl + (gx % nl)

    def leaf_tapes(perlane, w1p, w2p, immp):
        w1g = jnp.take(w1p, jnp.asarray(t_idx), axis=0)
        w2g = jnp.take(w2p, jnp.asarray(t_idx), axis=0)
        immg = jnp.take(immp, jnp.asarray(t_idx), axis=0)
        per_sub = perlane[jnp.asarray(t_idx), jnp.asarray(k_local)]
        codes_u8 = DeviceSimplifier.unpack_codes(per_sub, w1p.shape[1])
        w1l, w2l, imml, lenl, _ = DynamicSimplifier.reconstruct(
            w1g, w2g, immg, codes_u8, op_order=r.op_order
        )
        return w1l, w2l, imml, jnp.where(jnp.asarray(valid), lenl, 0)

    w1l, w2l, imml, lenl = stage(
        "reconstruct", leaf_tapes, perlane, w1p, w2p, immp
    )

    z_lo = float(np.asarray(z0s)[0])
    y_base = float(np.asarray(y0s).min())
    vox_dx = jnp.asarray(r.vox_dx)
    vox_dy = jnp.asarray(r.vox_dy)
    vox_dz = jnp.asarray(r.vox_dz)

    def voxel_pass(w1l, w2l, imml, lenl, vec):
        bx = (jnp.asarray(gx) * sub).astype(jnp.float32)[:, None]
        by = (jnp.asarray(gy) * sub).astype(jnp.float32)[:, None] + y_base
        bz = (jnp.asarray(lz) * sub).astype(jnp.float32)[:, None] + z_lo
        px = bx + vox_dx[None, :]
        py = by + vox_dy[None, :]
        pz = bz + vox_dz[None, :]
        vars_v = r._point_vars(mat, vec, px, py, pz, r.s0v, (cap_s,))
        return interp_voxel_depth(
            w1l, w2l, imml, lenl, vars_v,
            nf=r.nf, n_inputs=r.n_inputs, s0=r.s0v,
            sub=sub, interpret=r.interpret, op_order=r.op_order,
        )

    local = stage("voxel depth", voxel_pass, w1l, w2l, imml, lenl, vec)
    print("nonzero voxel columns:", int((np.asarray(local) > 0).sum()), flush=True)
    print("ALL STAGES PASSED", flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    main(n, cap)
