"""Validate the `strata='stages'` driver on real TPU hardware.

Two phases:
1. 512^3: stages vs the fused scan driver (both known-good sizes) —
   depth must match exactly.
2. 1024^3 gyroid heightmap through stages (the size where BOTH fused
   drivers once hit XLA:TPU program-level faults, demos/probe_1024.py).
   Success = no worker crash + nonzero fill + occupancy consistent
   with the 512^3 render after a 2x block reduce. The cross-resolution
   DEPTH comparison is reported but not asserted: near-vertical gyroid
   sheets legitimately shift multiple voxels between resolutions
   (measured p99 ~5 vox at r4 HEAD and r5 alike — it is a property of
   the metric, not a driver bug).
3. 1024^3 SPHERE heightmap vs the closed form with a 2-voxel epsilon —
   exact full-resolution ground truth (the voxel_render.rs strategy),
   which is the hard correctness assert at this size.

Run alone (holds the chip): python demos/probe_stages_1024.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def gyroid_tape():
    from fidget_tpu import Tree
    from fidget_tpu.shape import Shape

    x, y, z = Tree.axes()
    s = 4.0
    xs, ys, zs = x * s, y * s, z * s
    g = xs.sin() * ys.cos() + ys.sin() * zs.cos() + zs.sin() * xs.cos()
    fill = abs(g) - 0.2
    sphere = (xs.square() + ys.square() + zs.square()).sqrt() - s * 0.8
    return Shape.from_tree(sphere.max(fill)).tape()


def main():
    from fidget_tpu.render.region import VoxelSize
    from fidget_tpu.render.render3d import VoxelRenderer

    tape = gyroid_tape()

    n = 512
    print(f"--- {n}^3 stages vs scan ---", flush=True)
    r_scan = VoxelRenderer(
        tape, VoxelSize(n, n, n), tile_size=64, sub_size=16,
        strata="scan",
    )
    t0 = time.time()
    a = r_scan.render(mode="heightmap")
    print(f"scan render: {time.time() - t0:.1f}s "
          f"filled={(np.asarray(a.depth) > 0).mean():.4f}", flush=True)
    r_st = VoxelRenderer(
        tape, VoxelSize(n, n, n), tile_size=64, sub_size=16,
        strata="stages",
    )
    t0 = time.time()
    b = r_st.render(mode="heightmap")
    print(f"stages render: {time.time() - t0:.1f}s", flush=True)
    if not (np.asarray(a.depth) == np.asarray(b.depth)).all():
        diff = (np.asarray(a.depth) != np.asarray(b.depth)).sum()
        print(f"FAIL: {diff} px differ at {n}^3")
        sys.exit(1)
    print("512^3 stages == scan exactly", flush=True)

    n = 1024
    print(f"--- {n}^3 stages ---", flush=True)
    r_big = VoxelRenderer(
        tape, VoxelSize(n, n, n), tile_size=64, sub_size=16,
        strata="stages",
    )
    t0 = time.time()
    big = r_big.render(mode="heightmap")
    dt = time.time() - t0
    d = np.asarray(big.depth)
    print(f"1024^3 stages render: {dt:.1f}s filled={(d > 0).mean():.4f}",
          flush=True)

    # consistency vs 512^3: block-reduce the 1024 depth 2x (max), halve
    small = np.asarray(a.depth)
    red = d.reshape(512, 2, 512, 2).max((1, 3)) / 2.0
    filled_both = (small > 0) & (red > 0)
    err = np.abs(red[filled_both] - small[filled_both])
    occ_agree = ((small > 0) == (red > 0)).mean()
    print(f"occupancy agreement vs 512^3: {occ_agree:.4f}; "
          f"depth |err| p99={np.percentile(err, 99):.1f} vox "
          f"(subvoxel sampling differences expected at edges)", flush=True)
    assert occ_agree > 0.99, "1024^3 occupancy inconsistent with 512^3"

    # --- phase 3: 1024^3 sphere vs closed form (exact truth) ---------
    from fidget_tpu import Context, lower

    ctx = Context()
    x, y, z = ctx.x(), ctx.y(), ctx.z()
    r2 = ctx.add(ctx.square(x), ctx.add(ctx.square(y), ctx.square(z)))
    sph = lower(ctx, [ctx.sub(ctx.sqrt(r2), ctx.constant(0.8))])
    rs = VoxelRenderer(
        sph, VoxelSize(n, n, n), tile_size=64, sub_size=16,
        strata="stages",
    )
    t0 = time.time()
    ds = np.asarray(rs.render(mode="heightmap").depth).astype(np.float64)
    print(f"1024^3 sphere render: {time.time() - t0:.1f}s", flush=True)
    s2w = np.asarray(rs.s2w)
    ys_, xs_ = np.mgrid[0:n, 0:n].astype(np.float64)
    pos = np.stack([xs_, ys_, ds, np.ones_like(xs_)], axis=-1) @ s2w.T
    eps = 2.0 * 2.0 / n
    hit = (ds > 0) & (ds < n)
    rr = np.sqrt((pos[hit][:, :3] ** 2).sum(axis=1))
    p100 = np.abs(rr - 0.8).max()
    print(f"sphere |r-0.8| max={p100:.5f} (eps {eps:.5f})", flush=True)
    assert p100 <= eps, "1024^3 sphere depths inconsistent w/ closed form"
    empty = ds == 0
    rxy = np.sqrt(pos[..., 0] ** 2 + pos[..., 1] ** 2)
    assert (rxy[empty] >= 0.8 - eps).all()
    print("OK: 1024^3 stages render validated", flush=True)


if __name__ == "__main__":
    main()
