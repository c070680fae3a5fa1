"""Full benchmark sweep over BASELINE.json's named configs on real TPU.

Emits one JSON line per config (same shape as bench.py's output):
  2D renders: hi.vm@256^2, quarter.vm@1024^2, prospero.vm@1024^2 via
    the tiled-unrolled pipeline, steady-state Mpix/s by the K-slope
    method, occupancy-guarded against dense brute force.
  3D render: gyroid-sphere.rhai@512^3 heightmap + normals, device
    compute ms/frame (perturbed transform per frame).
  Mesh: colonnade.vm MDC depth-8, warm build seconds.

Run alone (holds the chip): python demos/bench_all.py [--quick]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_2d(name, N, results):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from fidget_tpu.io.models import load_vm_tape
    from fidget_tpu.render.region import ImageSize
    from fidget_tpu.render.render2d import PixelRenderer, _frame_unrolled_fn

    TILE = 8   # round-3 sweep winner (demos/exp_unrolled_tiles.py)
    tape = load_vm_tape(name)
    r = PixelRenderer(tape, ImageSize(N, N))
    img = r.render_unrolled(tile_size=TILE)
    brute = r.render_brute()
    agree = float((img.inside() == (brute < 0)).mean())
    if agree < 0.9999:
        results.append(dict(metric=f"{name} {N}^2 FAILED occupancy",
                            value=agree, unit="fraction", vs_baseline=0.0))
        return
    cap = r._ucap[TILE]
    n0x = n0y = -(-N // TILE)
    fn = _frame_unrolled_fn(
        id(r.tape), TILE, n0x, n0y, cap, r.n_inputs, False, r.interpret
    )
    tx = np.arange(n0x) * TILE
    gx, gy = np.meshgrid(tx, tx)
    x0 = jnp.asarray(gx.reshape(-1).astype(np.float32))
    y0 = jnp.asarray(gy.reshape(-1).astype(np.float32))
    mat = jnp.asarray(r._mat4(None))
    vec = jnp.zeros(r.n_inputs, jnp.float32)

    def make(K):
        def many(mat):
            def body(k, acc):
                m = mat * (1.0 + 1e-7 * k.astype(jnp.float32))
                dist, fill, na = fn(x0, y0, m, jnp.float32(0.0), vec)
                return acc + jnp.sum(dist) + na.astype(jnp.float32)

            return lax.fori_loop(0, K, body, jnp.float32(0.0))

        return jax.jit(many)

    best = {}
    for K in (4, 16):
        f = make(K)
        _ = float(f(mat))
        b = float("inf")
        for i in range(3):
            t0 = time.time()
            _ = float(f(mat * (1.0 + 1e-6 * (i + 1))))
            b = min(b, time.time() - t0)
        best[K] = b
    ms = (best[16] - best[4]) / 12 * 1e3
    mpix = N * N / ms / 1e3
    results.append(dict(
        metric=f"{name} {N}^2 2D tiled-unrolled render",
        value=round(mpix, 1), unit="Mpix/s",
        vs_baseline=round(mpix / 18.1, 2),
    ))


def bench_3d(results):
    import jax
    import jax.numpy as jnp

    from fidget_tpu.io.models import load_script
    from fidget_tpu.render.region import VoxelSize
    from fidget_tpu.render.render3d import VoxelRenderer
    from fidget_tpu.shape import Shape

    n = 512
    tree = load_script("gyroid-sphere.rhai")  # traced Tree
    tape = Shape.from_tree(tree).tape()
    for mode, kw in (
        ("heightmap", {}),
        ("normals", {}),
        # the fully-unrolled pipeline (leaf + proofs as straight-line
        # XLA, no interpreter) — the 3D fidget-JIT analog
        ("heightmap", dict(leaf="unrolled", proofs="unrolled")),
    ):
        r = VoxelRenderer(tape, VoxelSize(n, n, n), **kw)
        vec = jnp.zeros(r.n_inputs, jnp.float32)

        @jax.jit
        def frame_sum(mat):
            depth, normal, n_active = r._frame_impl(
                mat, vec, mode=mode, cap=r.cap
            )
            s = jnp.sum(depth).astype(jnp.float32)
            if normal is not None:
                s = s + jnp.sum(normal)
            return s

        base = np.eye(4, dtype=np.float32)
        float(frame_sum(jnp.asarray(base)))
        ts = []
        for i in range(5):
            m = base.copy()
            m[0, 3] = 1e-5 * (i + 1)
            t0 = time.perf_counter()
            float(frame_sum(jnp.asarray(m)))
            ts.append(time.perf_counter() - t0)
        ms = min(ts) * 1e3
        # the reference publishes no absolute 3D numbers; vs_baseline
        # is our own declared target (25 ms device frame at 512^3,
        # VERDICT r3 item 6) so progress is judgeable round-over-round
        results.append(dict(
            metric=(
                f"gyroid-sphere.rhai {n}^3 3D {mode}"
                + (" unrolled" if kw else "")
                + " device frame"
            ),
            value=round(ms, 1), unit="ms",
            vs_baseline=round(25.0 / ms, 2),
        ))


def bench_mesh(results):
    from fidget_tpu.io.models import load_vm_tape
    from fidget_tpu.mesh import Settings, build_mesh

    tape = load_vm_tape("colonnade.vm")
    build_mesh(tape, Settings(depth=8))  # compile/warm
    best = np.inf
    for i in range(2):
        w = np.eye(4)
        w[0, 3] = 1e-6 * (i + 1)
        t0 = time.perf_counter()
        m = build_mesh(tape, Settings(depth=8, world_to_model=w))
        best = min(best, time.perf_counter() - t0)
    # declared target: 2 s warm depth-8 (VERDICT r3 item 4); the
    # reference publishes no absolute mesh numbers
    results.append(dict(
        metric="colonnade.vm MDC depth-8 mesh build (warm)",
        value=round(best, 2), unit="s",
        vs_baseline=round(2.0 / best, 2),
    ))
    # unrolled eval cores (whole tape as straight-line XLA)
    build_mesh(tape, Settings(depth=8, eval="unrolled"))  # compile/warm
    best = np.inf
    for i in range(2):
        w = np.eye(4)
        w[0, 3] = 1e-6 * (i + 1)
        t0 = time.perf_counter()
        m = build_mesh(
            tape, Settings(depth=8, world_to_model=w, eval="unrolled")
        )
        best = min(best, time.perf_counter() - t0)
    results.append(dict(
        metric="colonnade.vm MDC depth-8 mesh build (warm, unrolled)",
        value=round(best, 2), unit="s",
        vs_baseline=round(2.0 / best, 2),
    ))


def main():
    quick = "--quick" in sys.argv
    results = []
    bench_2d("hi.vm", 256, results)
    print(json.dumps(results[-1]), flush=True)
    bench_2d("quarter.vm", 1024, results)
    print(json.dumps(results[-1]), flush=True)
    bench_2d("prospero.vm", 1024, results)
    print(json.dumps(results[-1]), flush=True)
    if not quick:
        n0 = len(results)
        bench_3d(results)
        for r in results[n0:]:
            print(json.dumps(r), flush=True)
        bench_mesh(results)
        print(json.dumps(results[-1]), flush=True)
    out = os.environ.get("BENCH_ALL_OUT")
    if out:
        import datetime

        with open(out, "w") as f:
            json.dump({
                "configs": results,
                "note": "K-slope 2D Mpix/s vs fidget 18.1; 3D/mesh vs_baseline "
                        "= declared target/actual (25 ms 512^3 frame, "
                        "2 s depth-8 warm build); occupancy-guarded",
            }, f, indent=1)


if __name__ == "__main__":
    main()
