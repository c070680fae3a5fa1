"""Headline benchmark + BASELINE-config sweep.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", "extra"}.

The headline metric is steady-state prospero.vm 1024^2 render
throughput in Mpix/s via the tiled-unrolled pipeline (8-px interval
culling, compacted worklists, and — since round 5 — per-block
UNION-SIMPLIFIED leaf tapes with per-frame validity routing, the
fidget-JIT-runs-simplified-tapes analog; compiler/unions.py). The
reference baseline is fidget's published number — 14.489 ms/frame at
512^2 with the multithreaded VM evaluator (demos/README.md:8-13) =
18.1 Mpix/s.

Methodology: frames are rendered in batches of K inside one jitted
fori_loop (one device dispatch per batch) to amortize the dev-tunnel's
~30 ms dispatch latency, with the transform perturbed per frame so no
loop-invariant work can be hoisted and no dispatch is cache-identical;
the batch result is forced via a scalar checksum transfer. Wall time
over the whole batch / K = frame time. Every frame performs the full
pipeline: root interval cull + choice capture, validity routing,
compaction, per-block union leaf + full-tape fallback leaf, scatter-
back, fill assembly. Two guards must pass before timing: occupancy AND
evaluated distances of the exact timed path vs dense brute force (a
wrong transform once made a blank-frame "187 Mpix/s").

`extra` carries the rest of the BASELINE sweep (VERDICT r4 item 2),
each config with its own correctness guard:
  hi.vm@256^2 and quarter.vm@1024^2 (2D, K-slope Mpix/s),
  gyroid-sphere.rhai@512^3 heightmap + normals (device ms/frame,
    guarded exact-vs-brute at 128^3),
  colonnade.vm MDC depth-8 (warm build seconds + triangle count,
    guarded closed-2-manifold),
  prospero pixel-gradient step (forward+backward wrt camera through
    the Pallas interpreter pipeline's reverse-mode autodiff, guarded
    against finite differences).
A failed extra config records an "error" entry; it cannot affect the
headline fields.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_MPIX_S = 18.1  # fidget demos/README.md: 14.489 ms @ 512^2
TILE = 8
#: headline leaf mode: "union" = per-block union-simplified tapes —
#: 0.851 ms/frame (1233 Mpix/s) vs the full-tape leaf's 0.966
#: (demos/exp_union_leaf.py, v4 frame; exp_union_stages3.py carries
#: the stage-by-stage cost model)
HEADLINE_LEAF = "union"
BLOCK_PX = 256


def fail(metric, value):
    print(json.dumps({
        "metric": metric, "value": float(value), "unit": "fraction",
        "vs_baseline": 0.0,
    }))
    sys.exit(1)


def _probe_once(timeout_s: float) -> bool:
    """One accelerator probe: a trivial jitted call in a subprocess.

    When the axon tunnel is down even `jax.devices()` blocks forever,
    so the probe must run under a hard external timeout."""
    import subprocess

    code = (
        "import jax, jax.numpy as jnp;"
        "x = jnp.ones((8, 128));"
        "assert float((x + 1).sum()) == 2048.0"
    )
    try:
        return (
            subprocess.run(
                [sys.executable, "-c", code],
                timeout=timeout_s,
                capture_output=True,
            ).returncode
            == 0
        )
    except subprocess.TimeoutExpired:
        return False


def probe_device(budget_s: float = 2700.0) -> float:
    """Wait (bounded) for the accelerator; return seconds waited or -1.

    The axon TPU tunnel goes down for minutes-to-hours (normal worker
    recovery is 5-25 min).  Round 3 failed its scored bench by giving
    up after one probe during an outage, so now we probe in a
    retry loop: short probes at first (a live tunnel answers in
    seconds), then 90 s probes spaced 60 s apart until the budget
    (default 45 min) runs out.  The wait is reported in the JSON."""
    t0 = time.time()
    timeout = 120.0
    while True:
        if _probe_once(timeout):
            return time.time() - t0
        if time.time() - t0 > budget_s:
            return -1.0
        time.sleep(60.0)
        timeout = 90.0


def _kloop(fn, args, mat, K):
    """jit a K-frame fori_loop over `fn` with per-frame perturbed mat;
    returns the jitted callable (checksum-forced)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def many(mat):
        def body(k, acc):
            m = mat * (1.0 + 1e-7 * k.astype(jnp.float32))
            out = fn(args[0], args[1], m, args[3], args[4])
            return acc + jnp.sum(out[0]) + out[2].astype(jnp.float32)

        return lax.fori_loop(0, K, body, jnp.float32(0.0))

    return jax.jit(many)


def bench_2d_config(name, N, leaf, block_px):
    """Guarded K-slope 2D throughput for one (model, size) config."""
    import jax.numpy as jnp

    from fidget_tpu.io.models import load_vm_tape
    from fidget_tpu.render.region import ImageSize
    from fidget_tpu.render.render2d import (
        PixelRenderer,
        _frame_union_fn,
        _frame_unrolled_fn,
        _register_plan,
    )

    tape = load_vm_tape(name)
    r = PixelRenderer(tape, ImageSize(N, N))
    kw = dict(leaf=leaf, block_px=block_px) if leaf == "union" else {}
    img = r.render_unrolled(tile_size=TILE, **kw)
    brute = r.render_brute()
    agree = float((img.inside() == (brute < 0)).mean())
    if agree < 0.9999:
        return None, {"error": f"occupancy {agree}"}
    ev = img.fill == 0
    ok = np.isclose(img.distance[ev], brute[ev], rtol=1e-5, atol=1e-5)
    ok |= np.isnan(img.distance[ev]) & np.isnan(brute[ev])
    if ok.mean() < 0.9999:
        return None, {"error": f"distance {ok.mean()}"}

    n0x = n0y = -(-N // TILE)
    n0 = n0x * n0y
    if leaf == "union":
        plan = r._uplans[(TILE, block_px)]
        fb_cap = max(128, -(-(n0 // 64) // 128) * 128)
        fn = _frame_union_fn(
            id(r.tape), _register_plan(plan), TILE, n0x, n0y, fb_cap,
            r.n_inputs, False, r.interpret,
        )
    else:
        cap = r._ucap[TILE]
        fn = _frame_unrolled_fn(
            id(r.tape), TILE, n0x, n0y, cap, r.n_inputs, False,
            r.interpret,
        )
    tx = np.arange(n0x) * TILE
    gx, gy = np.meshgrid(tx, tx)
    x0 = jnp.asarray(gx.reshape(-1).astype(np.float32))
    y0 = jnp.asarray(gy.reshape(-1).astype(np.float32))
    mat = jnp.asarray(r._mat4(None))
    vec = jnp.zeros(r.n_inputs, jnp.float32)
    args = (x0, y0, mat, jnp.float32(0.0), vec)
    # guard the EXACT timed (fn, args) pair: occupancy vs brute, no
    # worklist overflow
    out = fn(*args)
    d0, f0 = np.asarray(out[0])[:N, :N], np.asarray(out[1])[:N, :N]
    inside0 = np.where(f0 == 0, d0 < 0, (f0 - 1) % 2 + 1 == 1)
    if abs(inside0.mean() - (brute < 0).mean()) > 1e-4:
        return None, {"error": f"timed-path occupancy {inside0.mean()}"}
    if leaf == "union" and int(out[4]) > 0:
        return None, {"error": f"timed-path overflow {int(out[4])}"}
    if leaf != "union" and int(out[2]) > r._ucap[TILE]:
        return None, {"error": f"timed-path capacity {int(out[2])}"}
    return (r, fn, args), None


def _extra_2d(name, N, extra, key):
    import jax.numpy as jnp

    built, err = bench_2d_config(name, N, "full", 0)
    if err:
        extra[key] = err
        return
    r, fn, args = built
    # K-slope with WIDE separation: (16 - 4) once produced a negative
    # slope under timing noise; 448 frames of separation puts the
    # per-frame signal far above it
    best = {}
    for K in (64, 512):
        f = _kloop(fn, args, args[2], K)
        _ = float(f(args[2]))
        b = float("inf")
        for i in range(3):
            t0 = time.time()
            _ = float(f(args[2] * (1.0 + 1e-6 * (i + 1))))
            b = min(b, time.time() - t0)
        best[K] = b
    ms = (best[512] - best[64]) / 448 * 1e3
    mpix = N * N / ms / 1e3
    extra[key] = {
        "value": round(mpix, 1), "unit": "Mpix/s",
        "vs_baseline": round(mpix / BASELINE_MPIX_S, 2),
    }


def _extra_3d(extra):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from fidget_tpu.io.models import load_script, load_vm_tape
    from fidget_tpu.render.region import VoxelSize
    from fidget_tpu.render.render3d import VoxelRenderer
    from fidget_tpu.shape import Shape

    # gyroid-sphere is the BASELINE config; colonnade is the
    # reference's own voxel bench model (fidget/benches/voxel.rs:6-12)
    tree = load_script("gyroid-sphere.rhai")
    models = [
        ("gyroid_512", Shape.from_tree(tree).tape()),
        ("colonnade_512", load_vm_tape("colonnade.vm")),
    ]
    # the measured-fastest 3D config: fully-unrolled leaf AND proofs
    # (the 3D fidget-JIT analog; demos/exp_voxel_batch.py G=unrolled2)
    kw = dict(
        tile_size=64, sub_size=16, leaf="unrolled", proofs="unrolled",
    )
    n = 512
    K3 = 32
    for name, tape in models:
        # guard: pipeline exact vs brute oracle at 128^3, same config
        rg = VoxelRenderer(tape, VoxelSize(128, 128, 128), **kw)
        got = rg.render(mode="heightmap").depth
        want = rg.render_brute().depth
        if not (got == want).all():
            extra[name] = {
                "error":
                    f"128^3 guard: {(got != want).mean():.2%} mismatch"
            }
            continue
        for mode in ("heightmap", "normals"):
            r = VoxelRenderer(tape, VoxelSize(n, n, n), **kw)
            # settles worklist capacity (retries) AND builds the
            # per-stratum capacity schedule for the timed frames
            r.render(mode=mode)
            sched = r._sched
            vec = jnp.zeros(r.n_inputs, jnp.float32)

            def many(mat):
                def body(k, acc):
                    m = mat * (1.0 + 1e-7 * k.astype(jnp.float32))
                    depth, normal, n_active = r._frame_impl(
                        m, vec, mode=mode, cap=r.cap,
                        strata_caps=sched,
                    )
                    s = acc + jnp.sum(depth).astype(jnp.float32)
                    if normal is not None:
                        s = s + jnp.sum(normal)
                    return s

                return lax.fori_loop(0, K3, body, jnp.float32(0.0))

            f = jax.jit(many)
            base = jnp.asarray(np.eye(4, dtype=np.float32))
            float(f(base))
            best = float("inf")
            for i in range(3):
                m = base * (1.0 + 1e-6 * (i + 1))
                t0 = time.perf_counter()
                float(f(m))
                best = min(best, (time.perf_counter() - t0) / K3)
            extra[f"{name}_{mode}"] = {
                "value": round(best * 1e3, 2), "unit": "ms/frame",
            }


def _extra_mesh(extra):
    from fidget_tpu.io.models import load_vm_tape
    from fidget_tpu.mesh import Settings, build_mesh

    tape = load_vm_tape("colonnade.vm")
    # eval="unrolled" = the device-resident fused fine pipeline (the
    # measured-fastest config; the interp path is the zero-compile one)
    mesh = build_mesh(tape, Settings(depth=8, eval="unrolled"))
    # guard: closed 2-manifold (every undirected edge used exactly 2x)
    tris = np.asarray(mesh.triangles, np.int64)
    e = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]])
    e.sort(axis=1)
    _, counts = np.unique(e, axis=0, return_counts=True)
    if not (counts == 2).all():
        extra["colonnade_mesh_d8"] = {
            "error": f"manifold guard: {(counts != 2).mean():.2%} bad edges"
        }
        return
    best = np.inf
    for i in range(2):
        w = np.eye(4)
        w[0, 3] = 1e-6 * (i + 1)
        t0 = time.perf_counter()
        m = build_mesh(
            tape, Settings(depth=8, world_to_model=w, eval="unrolled")
        )
        best = min(best, time.perf_counter() - t0)
    extra["colonnade_mesh_d8"] = {
        "value": round(best, 2), "unit": "s (warm)",
        "triangles": int(len(mesh.triangles)),
    }


def _extra_backward(extra):
    """Pixel-gradient step: forward+backward wrt the camera matrix
    through the zero-recompile Pallas interpreter pipeline (reverse
    mode via interp_float's transposable JVP). Guard: the gradient
    must match the DENSE unrolled path's native-XLA-autodiff gradient
    (an independent implementation; finite differences are useless
    here — prospero's min/max-dense field makes any FD step cross
    kink boundaries, r5 bench run 2)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from fidget_tpu.io.models import load_vm_tape
    from fidget_tpu.render.region import ImageSize
    from fidget_tpu.render.render2d import PixelRenderer

    tape = load_vm_tape("prospero.vm")

    def make_loss(r, N):
        vec = jnp.zeros(r.n_inputs, jnp.float32)
        mat0 = jnp.asarray(r._mat4(None))
        target = jnp.asarray(
            r._frame(mat0, jnp.float32(0.0), vec, pixel_perfect=True)[0]
        )

        @jax.jit
        def loss(mat):
            img, _ = r._frame(
                mat, jnp.float32(0.0), vec, pixel_perfect=True
            )
            return jnp.sum((img - target) ** 2) / (N * N)

        return loss, mat0, vec, target

    # ---- correctness guard at 256^2: interp grad vs dense grad ------
    Ng = 256
    # 32-px tiles: the dual kernel's VMEM scratch is 4 register files
    # of [nf, s0, 128] f32 — at the default 128-px leaf (s0=128) that
    # is ~32 MB and Mosaic refuses it on real hardware (r5 bench run
    # 1); s0=8 fits comfortably
    rg = PixelRenderer(tape, ImageSize(Ng, Ng), tile_size=32)
    loss_g, mat0g, vecg, target_g = make_loss(rg, Ng)
    mat_g = mat0g * 1.05
    g_i = np.asarray(jax.grad(loss_g)(mat_g))

    rd = PixelRenderer(tape, ImageSize(Ng, Ng))
    rd.render_dense()

    @jax.jit
    def loss_d(mat):
        d = rd._dense_jit(mat, jnp.float32(0.0), vecg)
        return jnp.sum((d - target_g) ** 2) / (Ng * Ng)

    g_d = np.asarray(jax.grad(loss_d)(mat_g))
    top = np.argsort(-np.abs(g_d).ravel())[:3]
    rel = np.abs((g_i.ravel()[top] - g_d.ravel()[top])
                 / g_d.ravel()[top])
    if (rel > 0.05).any():
        extra["prospero_backward"] = {
            "error": f"dense-grad guard: rel {rel.tolist()}"
        }
        return

    # ---- timing at 1024^2 -------------------------------------------
    N = 1024
    r = PixelRenderer(tape, ImageSize(N, N), tile_size=32)
    loss, mat0, vec, target = make_loss(r, N)
    vg = jax.value_and_grad(loss)
    Kb = 8

    def many(mat):
        def body(k, acc):
            m = mat * (1.0 + 1e-7 * k.astype(jnp.float32))
            l, g = vg(m)
            return acc + l + jnp.sum(g)

        return lax.fori_loop(0, Kb, body, jnp.float32(0.0))

    f = jax.jit(many)
    mat = mat0 * 1.001
    float(f(mat))
    best = float("inf")
    for k in range(3):
        m = mat * (1.0 + 1e-6 * (k + 1))
        t0 = time.perf_counter()
        float(f(m))
        best = min(best, (time.perf_counter() - t0) / Kb)
    extra["prospero_backward"] = {
        "value": round(best * 1e3, 2),
        "unit": "ms/step (fwd+bwd wrt camera, interp pipeline)",
    }


def main() -> None:
    waited = probe_device()
    if waited < 0:
        fail("FAILED device unreachable after 45 min of retries "
             "(axon tunnel down?)", 0.0)

    import jax

    # ---- guard 0: the real-TPU canonical op matrix ------------------
    # (73 ops x float/interval/grad through the Mosaic kernels vs the
    # host oracles — a kernel-parity regression fails the scored
    # bench; infra errors only annotate). Cached kernels make this a
    # few seconds warm.
    parity = {}
    try:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from demos.tpu_parity import run_op_matrix

        run_op_matrix(parity)
        fails = [
            f
            for mode in parity.get("op_matrix", {}).values()
            for f in mode["fail"]
        ]
        if fails:
            fail("FAILED op-matrix parity: " + ",".join(fails[:5]), 0.0)
    except (ImportError, OSError):
        pass  # harness unavailable: not a kernel regression

    # ---- headline: prospero 1024^2 ----------------------------------
    built, err = bench_2d_config(
        "prospero.vm", 1024, HEADLINE_LEAF, BLOCK_PX
    )
    if err:
        fail("FAILED " + next(iter(err.values())), 0.0)
    r, fn, args = built
    N = 1024

    # K frames per dispatch: with the fused leaf a frame is <1 ms, so
    # the tunnel's ~28 ms dispatch latency needs a large batch to
    # amortize below the noise floor (at K=512 it adds ~0.06 ms/frame;
    # demos/probe_r3_gap.py confirms the residual is dispatch, not
    # compute). Every frame runs the full pipeline with a per-frame-
    # perturbed transform.
    K = 512
    f = _kloop(fn, args, args[2], K)
    _ = float(f(args[2]))  # compile + warm
    best = float("inf")
    for i in range(3):
        t0 = time.time()
        _ = float(f(args[2] * (1.0 + 1e-6 * (i + 1))))
        best = min(best, (time.time() - t0) / K)

    mpix_s = N * N / best / 1e6
    record = {
        "metric": "prospero.vm 1024^2 2D tiled-unrolled render "
                  "throughput",
        "value": round(mpix_s, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 2),
    }
    if waited > 10.0:
        record["tunnel_wait_s"] = round(waited, 1)

    # ---- extra: the rest of the BASELINE sweep ----------------------
    extra = {"headline_leaf": HEADLINE_LEAF}
    for label, fn_x in (
        ("hi_256", lambda e: _extra_2d("hi.vm", 256, e, "hi_256")),
        ("quarter_1024",
         lambda e: _extra_2d("quarter.vm", 1024, e, "quarter_1024")),
        # the upper end of the reference's 256-2048 size sweep
        # (fidget/benches/pixel.rs:37-70); full-tape leaf (a 65k-tile
        # union constant table is not worth the compile memory)
        ("prospero_2048",
         lambda e: _extra_2d("prospero.vm", 2048, e, "prospero_2048")),
        ("gyroid_512", _extra_3d),
        ("colonnade_mesh_d8", _extra_mesh),
        ("prospero_backward", _extra_backward),
    ):
        try:
            fn_x(extra)
        except Exception as ex:  # a failed extra must not kill the run
            extra[label] = {"error": f"{type(ex).__name__}: {ex}"}
    record["extra"] = extra
    print(json.dumps(record))


if __name__ == "__main__":
    main()
