"""Re-probe the 1024^3 fused strata drivers after the liveness fix.

History: before commit f56c4a6 (IMM12 liveness OOB-write clamp), BOTH
fused drivers (the lax.scan frame and the per-stratum host loop) hit
XLA:TPU program-level faults at 1024^3 while every stage passed in
isolation (demos/probe_1024.py), so `strata="auto"` routed >512^3
volumes to the `stages` driver. This probe renders the gyroid-sphere
heightmap at 1024^3 through scan, loop, AND stages and requires the
depth maps to match bit-exactly.

Success here is the evidence for removing the auto-route fence
(fidget_tpu/render/render3d.py::_strata_mode).

Run alone (holds the chip): python demos/probe_fused_1024.py [n]
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

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    tape = gyroid_tape()
    depths = {}
    for mode in ("stages", "loop", "scan"):
        r = VoxelRenderer(
            tape, VoxelSize(n, n, n), tile_size=64, sub_size=16,
            strata=mode,
        )
        t0 = time.time()
        img = r.render(mode="heightmap")
        d = np.asarray(img.depth)
        print(
            f"{mode}: {time.time() - t0:.1f}s "
            f"filled={(d > 0).mean():.4f}",
            flush=True,
        )
        depths[mode] = d

    ok = True
    for mode in ("loop", "scan"):
        same = (depths[mode] == depths["stages"]).all()
        n_diff = int((depths[mode] != depths["stages"]).sum())
        print(f"{mode} == stages: {bool(same)} (diff px: {n_diff})",
              flush=True)
        ok &= bool(same)
    if not ok:
        sys.exit(1)
    print(f"OK: all three strata drivers bit-exact at {n}^3", flush=True)


if __name__ == "__main__":
    main()
