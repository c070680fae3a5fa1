"""Extended fuzz soak: random expression graphs through every pipeline
vs the dense brute-force oracle, running until stopped.

The in-suite fuzz (tests/test_fuzz.py) covers a handful of fixed seeds;
this driver walks an open-ended seed range across the 2D bucketed,
2D tiled-unrolled (both culls), and 3D bucketed pipelines, plus a mesh
manifoldness check every 16th seed. Failures are logged with the seed
so they can be replayed as a one-line unit test.

Usage: python demos/fuzz_extended.py [start_seed] [end_seed]
(CPU-only; safe to run while the TPU tunnel is down.)
"""

import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from test_fuzz import random_tape

    from fidget_tpu.render.region import ImageSize, VoxelSize
    from fidget_tpu.render.render2d import FILL_NONE, PixelRenderer
    from fidget_tpu.render.render3d import VoxelRenderer

    start = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    end = int(sys.argv[2]) if len(sys.argv) > 2 else 10**9
    failures = 0

    def rand_mat2(seed):
        """Well-conditioned random world->model 3x3 (rotation + mild
        scale + translation); exercises the full coordinate path, which
        the fixed-identity fuzz never did."""
        rng = np.random.RandomState(seed ^ 0x5EED)
        th = rng.uniform(0, 2 * np.pi)
        s = rng.uniform(0.6, 1.6)
        tx, ty = rng.uniform(-0.4, 0.4, 2)
        c, si = np.cos(th), np.sin(th)
        return np.array(
            [[s * c, -s * si, tx], [s * si, s * c, ty], [0.0, 0.0, 1.0]]
        )

    def rand_mat3(seed):
        """Random 4x4 world->model for 3D: rotation about a random
        axis + mild scale + translation."""
        rng = np.random.RandomState(seed ^ 0x3D3D)
        ax = rng.normal(size=3)
        ax /= np.linalg.norm(ax)
        th = rng.uniform(0, 2 * np.pi)
        K = np.array(
            [[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]], [-ax[1], ax[0], 0]]
        )
        R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)
        s = rng.uniform(0.7, 1.4)
        m = np.eye(4)
        m[:3, :3] = s * R
        m[:3, 3] = rng.uniform(-0.3, 0.3, 3)
        return m

    def _on_discontinuity(r, tape, y, x, brute, mat2=None, vars_=None):
        """True when pixel (y, x) sits on a jump of the tape function.

        Random tapes contain mod: a pixel landing *exactly* on a mod
        boundary evaluates to either side depending on 1-ulp rounding
        differences between evaluators (XLA fuses mul+add into FMA; the
        host runs them separately — seed 1395 hit y == -1.0 exactly).
        Both answers are legitimate; accept the mismatch only if a tiny
        coordinate perturbation flips the host oracle's sign.
        """
        from fidget_tpu.eval.arith import FloatMode
        from fidget_tpu.eval.unrolled import eval_tape

        mat = r._mat4(mat2)
        sign0 = brute[y, x] < 0
        for dy, dx in ((1e-5, 0), (-1e-5, 0), (0, 1e-5), (0, -1e-5)):
            mx, my, mz = r._transform_points(
                mat, np.float32(x + dx), np.float32(y + dy), np.float32(0)
            )
            vec = r._var_vec(vars_)
            inputs = [
                np.array([v], np.float32) for v in np.asarray(vec).ravel()
            ] or [np.zeros(1, np.float32)]
            for kind, v in (("x", mx), ("y", my), ("z", mz)):
                idx = r.axis_of.get(kind)
                if idx is not None:
                    inputs[idx] = np.array([v], np.float32)
            with np.errstate(all="ignore"):
                (d,), _ = eval_tape(tape, FloatMode(np), inputs)
            if (float(d[0]) < 0) != sign0:
                return True
        return False

    def check_2d(seed):
        # every other seed renders under a random world->model
        # transform; every 8th binds a custom var; every 4th also
        # checks the differentiable pixel_perfect mode
        if seed % 8 == 0:
            tape, v = random_tape(seed, dims=2, with_var=True)
            vars_ = {v: float(np.random.RandomState(seed).uniform(-2, 2))}
        else:
            tape, vars_ = random_tape(seed, dims=2), None
        mat = rand_mat2(seed) if seed % 2 else None
        r = PixelRenderer(
            tape, ImageSize(128, 128), tile_size=32, interpret=True
        )
        brute = r.render_brute(mat, vars=vars_)
        img = r.render(mat, vars=vars_)
        ev = img.fill == FILL_NONE
        both_nan = np.isnan(img.distance) & np.isnan(brute)
        close = np.isclose(img.distance, brute, rtol=1e-4, atol=1e-5)
        assert (close | both_nan)[ev].all(), "2D distances"
        cls = img.fill_class()
        assert (brute[cls == 1] < 0).all(), "2D inside fill unsound"
        assert not (brute[cls == 2] < 0).any(), "2D outside fill unsound"

        def probe_bad(bad, label):
            ys, xs = np.nonzero(bad)
            assert len(ys) <= 8, f"{label}: {len(ys)} bad pixels"
            for y, x in zip(ys, xs):
                assert _on_discontinuity(
                    r, tape, int(y), int(x), brute, mat2=mat, vars_=vars_
                ), f"{label} differs off-discontinuity at ({y}, {x})"

        if seed % 4 == 0:
            pp = r.render(mat, vars=vars_, pixel_perfect=True)
            ppnan = np.isnan(pp.distance) & np.isnan(brute)
            ppclose = np.isclose(pp.distance, brute, rtol=1e-4, atol=1e-5)
            probe_bad(~(ppclose | ppnan), "pixel_perfect")

        # tiled-unrolled, both cull variants
        for cull in ("unrolled", "interp"):
            u = r.render_unrolled(mat, vars=vars_, tile_size=16, cull=cull)
            uev = u.fill == FILL_NONE
            uclose = np.isclose(u.distance, brute, rtol=1e-4, atol=1e-5)
            ubnan = np.isnan(u.distance) & np.isnan(brute)
            bad = (u.inside() != (brute < 0)) | (uev & ~(uclose | ubnan))
            if bad.any():
                probe_bad(bad, f"unrolled({cull})")

    def check_3d(seed):
        tape = random_tape(seed, dims=3)
        mat = rand_mat3(seed) if seed % 2 else None
        r = VoxelRenderer(
            tape, VoxelSize(32, 32, 32), tile_size=16, sub_size=8,
            interpret=True, specialize=False,
        )
        img = r.render(mat, mode="heightmap", max_retries=6)
        brute = r.render_brute(mat)
        np.testing.assert_array_equal(img.depth, brute.depth)
        if seed % 8 == 0:
            # the fully-unrolled 3D pipeline (per-shape compile:
            # sampled, not every seed)
            ru = VoxelRenderer(
                tape, VoxelSize(32, 32, 32), tile_size=16, sub_size=8,
                interpret=True, leaf="unrolled", proofs="unrolled",
            )
            uimg = ru.render(mat, mode="heightmap", max_retries=6)
            np.testing.assert_array_equal(uimg.depth, brute.depth)

    def check_mesh(seed):
        from fidget_tpu.mesh import Settings, build_mesh

        tape = random_tape(seed, dims=3)
        ev = "unrolled" if seed % 32 == 0 else "interp"
        mat = rand_mat3(seed) if seed % 32 == 16 else None
        m = build_mesh(
            tape,
            Settings(depth=4, interpret=True, eval=ev, world_to_model=mat),
        )
        T = np.asarray(m.triangles)
        if len(T) == 0:
            return
        # MDC manifoldness, honestly stated (matches the reference's
        # actual guarantee, not its aspirational docs): an ambiguous
        # face (alternating corner signs, 4 crossing edges) between two
        # single-component cells pinches the surface — the quad mesh
        # legitimately shares that vertex pair 4x (2x each direction),
        # and one less when a ring quad is dropped at the open volume
        # boundary (seed 1424). The reference's dual walk emits the
        # identical topology (fidget-mesh/src/dc.rs; its manifold test
        # shapes never produce an ambiguous face). So: per undirected
        # edge, count <= 4 and direction imbalance <= 1.
        edges = np.concatenate([T[:, [0, 1]], T[:, [1, 2]], T[:, [2, 0]]])
        und = np.sort(edges, 1)
        uniq, inv, counts = np.unique(
            und, axis=0, return_inverse=True, return_counts=True
        )
        assert (counts <= 4).all(), "edge used >4x"
        fwd = np.bincount(
            inv, weights=(edges[:, 0] < edges[:, 1]), minlength=len(uniq)
        )
        imbalance = np.abs(2 * fwd - counts)
        assert (imbalance <= 1).all(), "edge direction imbalance >1"

    t0 = time.time()
    for seed in range(start, end):
        for name, fn in (
            ("2d", check_2d),
            ("3d", check_3d),
        ) + ((("mesh", check_mesh),) if seed % 16 == 0 else ()):
            try:
                fn(seed)
            except KeyboardInterrupt:
                raise
            except Exception:
                failures += 1
                print(f"FAIL seed={seed} stage={name}", flush=True)
                traceback.print_exc()
        if seed % 10 == 0:
            dt = time.time() - t0
            print(
                f"seed {seed} done ({dt:.0f}s elapsed, {failures} failures)",
                flush=True,
            )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
