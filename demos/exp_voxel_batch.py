"""Measure the voxel-pass grid batching lever on TPU.

The 3D voxel pass runs one Pallas grid step per compacted subtile
(~2 us fixed cost each; demos/exp_grid_overhead.py measures the
primitive). interp_voxel_depth(tiles_per_step=G) amortizes it by
evaluating G subtiles per step. This times the full gyroid 512^3
heightmap frame across G values with the bench.py methodology
(K-frame fori_loop, perturbed transform per frame, K-slope timing).

Run alone (holds the chip): python demos/exp_voxel_batch.py [G ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from fidget_tpu.core.tree import Tree
    from fidget_tpu.render.region import VoxelSize
    from fidget_tpu.render.render3d import VoxelRenderer
    from fidget_tpu.shape import Shape

    gs = [int(a) for a in sys.argv[1:]] or [1, 4, 8, 16]

    scale = 8.0
    x, y, z = Tree.axes()
    xs, ys, zs = x * scale, y * scale, z * scale
    g = xs.sin() * ys.cos() + ys.sin() * zs.cos() + zs.sin() * xs.cos()
    fill = abs(g) - 0.2
    sphere = (xs.square() + ys.square() + zs.square()).sqrt() - scale * 0.8
    tape = Shape.from_tree(sphere.max(fill)).tape()

    n = int(os.environ.get("FIDGET_EXP_N", "512"))
    ref_depth = None
    for G in gs + ["unrolled", "unrolled2"]:
        kw = (
            dict(leaf="unrolled")
            if G == "unrolled"
            else dict(leaf="unrolled", proofs="unrolled")
            if G == "unrolled2"
            else dict(voxel_tiles_per_step=G)
        )
        r = VoxelRenderer(
            tape, VoxelSize(n, n, n), tile_size=64, sub_size=16, **kw,
        )
        mat = r._mat4(None)
        vec = r._var_vec(None)

        def batch(K, eps, mat=mat, vec=vec, r=r):
            matj = jnp.asarray(mat)
            vecj = jnp.asarray(vec)

            def body(k, acc):
                m = matj * (1.0 + 1e-7 * k.astype(jnp.float32) + eps)
                depth, _, _ = r._frame_impl(
                    m, vecj, mode="heightmap", cap=r.cap
                )
                return acc + jnp.sum(depth).astype(jnp.float32)

            return lax.fori_loop(0, K, body, jnp.float32(0.0))

        jb = jax.jit(batch, static_argnums=0)
        t0 = time.time()
        _ = float(jb(4, jnp.float32(0.0)))
        compile_s = time.time() - t0

        def timed(K):
            best = float("inf")
            for i in range(3):
                t0 = time.time()
                _ = float(jb(K, jnp.float32(1e-9 * (i + 1))))
                best = min(best, time.time() - t0)
            return best

        t4, t16 = timed(4), timed(16)
        ms = (t16 - t4) / 12 * 1e3

        # correctness spot-check on the real chip
        img = r.render(mode="heightmap")
        if ref_depth is None:
            ref_depth = np.asarray(img.depth)
            match = "ref"
        else:
            match = "OK" if (np.asarray(img.depth) == ref_depth).all() else "MISMATCH"
        print(
            f"G={G!s:>8}: {ms:8.2f} ms/frame (compile {compile_s:5.1f} s) "
            f"depth {match}",
            flush=True,
        )


if __name__ == "__main__":
    main()
