"""Stage-isolation probe for the tile=32/sub=16 TPU worker crash.

Usage: python demos/probe_crash.py <stage> <N> [tile] [sub]
Runs ONE pipeline stage of the 3D renderer in this process and prints
(valid stages: root, simplify, full — finer stages folded into the
strata scan)
OK; a worker crash identifies the faulting kernel. Run stages in
separate processes, front to back.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fidget_tpu.render.region import VoxelSize
from fidget_tpu.render.render3d import VoxelRenderer
from fidget_tpu.shape import Shape, Tree


def gyroid_sphere_tape(scale=4.0):
    x, y, z = Tree.axes()
    xs, ys, zs = x * scale, y * scale, z * scale
    g = xs.sin() * ys.cos() + ys.sin() * zs.cos() + zs.sin() * xs.cos()
    fill = abs(g) - 0.2
    sphere = (xs.square() + ys.square() + zs.square()).sqrt() - scale * 0.8
    return Shape.from_tree(sphere.max(fill)).tape()


def main():
    stage = sys.argv[1]
    N = int(sys.argv[2])
    ts = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    sub = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    r = VoxelRenderer(
        gyroid_sphere_tape(), VoxelSize(N, N, N), tile_size=ts, sub_size=sub
    )
    vec = jnp.zeros(r.n_inputs, jnp.float32)
    mat = jnp.asarray(np.eye(4, dtype=np.float32))
    stop = None if stage == "full" else stage

    @jax.jit
    def run(m):
        outs = r._frame_tiles(
            m, vec,
            jnp.asarray(r.tile_x0), jnp.asarray(r.tile_y0),
            jnp.asarray(r.tile_z0),
            mode="heightmap", cap=r.cap, stop_after=stop,
        )
        return sum(
            jnp.sum(o).astype(jnp.float32) for o in outs if o is not None
        )

    print("compiling+running", stage, N, ts, sub, flush=True)
    v = float(run(mat))
    print("OK", stage, N, v, flush=True)


if __name__ == "__main__":
    main()
