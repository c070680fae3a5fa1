"""3D renderer timing breakdown on the real TPU.

Times gyroid 512^3 in heightmap vs normals mode, perturbing the
world_to_model matrix per frame (axon dispatch-cache rule), and
separates device compute from tunnel transfer by forcing results via a
device-side checksum.
"""

import os
import sys
import time

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


def time_compute(r, mode, n=5):
    """Device-only time: checksum the frame outputs, transfer 1 scalar."""
    vec = jnp.zeros(r.n_inputs, jnp.float32)

    @jax.jit
    def frame_sum(mat):
        depth, normal, n_active = r._frame_impl(mat, vec, mode=mode, cap=r.cap)
        s = jnp.sum(depth).astype(jnp.float32)
        if normal is not None:
            s = s + jnp.sum(normal)
        return s

    base = np.eye(4, dtype=np.float32)
    float(frame_sum(jnp.asarray(base)))  # compile
    ts = []
    for i in range(n):
        m = base.copy()
        m[0, 3] = 1e-5 * (i + 1)
        t0 = time.perf_counter()
        float(frame_sum(jnp.asarray(m)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def time_full(r, mode, n=5):
    r.render(mode=mode)
    ts = []
    for i in range(n):
        m = np.eye(4, dtype=np.float32)
        m[0, 3] = 1e-5 * (i + 1)
        t0 = time.perf_counter()
        r.render(m, mode=mode)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def time_stage(r, stop_after, n=5):
    vec = jnp.zeros(r.n_inputs, jnp.float32)

    @jax.jit
    def partial(mat):
        outs = r._frame_tiles(
            mat, vec,
            jnp.asarray(r.tile_x0), jnp.asarray(r.tile_y0),
            jnp.asarray(r.tile_z0),
            mode="heightmap", cap=r.cap, stop_after=stop_after,
        )
        return sum(jnp.sum(o).astype(jnp.float32) for o in outs)

    base = np.eye(4, dtype=np.float32)
    float(partial(jnp.asarray(base)))
    ts = []
    for i in range(n):
        m = base.copy()
        m[0, 3] = 1e-5 * (i + 1)
        t0 = time.perf_counter()
        float(partial(jnp.asarray(m)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def sweep():
    N = 512
    tape = gyroid_sphere_tape()
    # NOTE: (32, 16) at 512^3 is excluded — it crashes the TPU worker
    # (XLA program-level fault, see README Known issues)
    for ts_, sub in ((64, 16), (64, 32)):
        r = VoxelRenderer(tape, VoxelSize(N, N, N), tile_size=ts_, sub_size=sub)
        r.render(mode="heightmap")  # warms + settles cap retries
        vec = jnp.zeros(r.n_inputs, jnp.float32)
        _, _, n_active = r._frame(
            jnp.asarray(np.eye(4, dtype=np.float32)), vec, mode="heightmap", cap=r.cap
        )
        ch = time_compute(r, "heightmap")
        print(
            f"tile={ts_:3d} sub={sub:2d} cap={r.cap:6d} "
            f"n_active={int(n_active):6d}  compute={ch*1e3:6.1f} ms"
        )


def main():
    N = 512
    tape = gyroid_sphere_tape()
    r = VoxelRenderer(tape, VoxelSize(N, N, N))
    print(f"tape len={len(tape)} nf={r.nf} cap={r.cap} s0n={r.s0n}")
    img = r.render(mode="heightmap")
    prev = 0.0
    for st in ("root", "simplify", "subtile", "compact"):
        t = time_stage(r, st)
        print(f"through {st:9s}: {t*1e3:6.1f} ms (+{(t-prev)*1e3:.1f})")
        prev = t
    sweep()
    ch = time_compute(r, "heightmap")
    cn = time_compute(r, "normals")
    print(f"compute-only heightmap: {ch*1e3:.1f} ms")
    print(f"compute-only normals:   {cn*1e3:.1f} ms  (normals stage ~{(cn-ch)*1e3:.1f} ms)")
    th = time_full(r, "heightmap")
    tn = time_full(r, "normals")
    print(f"with transfer heightmap: {th*1e3:.1f} ms")
    print(f"with transfer normals:   {tn*1e3:.1f} ms")


if __name__ == "__main__":
    main()
