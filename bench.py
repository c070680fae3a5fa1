"""Headline benchmark: prospero.vm 2D render at 1024x1024.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The metric is steady-state render throughput in Mpix/s via the
tiled-unrolled pipeline (8-px interval culling + the whole tape
compiled into XLA over the compacted active-tile worklist — the
fidget-JIT-with-culling analog; 8-px tiles cull to 38% active on
prospero and won the round-3 sweep, demos/exp_unrolled_tiles.py). The reference baseline is fidget's
published number — 14.489 ms/frame at 512^2 with the multithreaded VM
evaluator (demos/README.md:8-13) = 18.1 Mpix/s.

Methodology: frames are rendered in batches of K inside one jitted
fori_loop (one device dispatch per batch) to amortize the dev-tunnel's
~30 ms dispatch latency, with the transform perturbed per frame so no
loop-invariant work can be hoisted and no dispatch is cache-identical;
the batch result is forced via a scalar checksum transfer. Wall time
over the whole batch / K = frame time. Every frame performs the full
pipeline: root interval cull, compaction, unrolled leaf evaluation,
scatter-back, fill assembly. Two guards must pass before timing:
occupancy AND evaluated distances of the exact timed path vs dense
brute force (a wrong transform once made a blank-frame "187 Mpix/s").
"""

import json
import sys
import time

import numpy as np

BASELINE_MPIX_S = 18.1  # fidget demos/README.md: 14.489 ms @ 512^2
TILE = 8


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


def main() -> None:
    waited = probe_device()
    if waited < 0:
        fail("FAILED device unreachable after 45 min of retries "
             "(axon tunnel down?)", 0.0)

    import jax
    import jax.numpy as jnp
    from jax import lax

    from fidget_tpu.io.models import load_vm_tape
    from fidget_tpu.render.region import ImageSize
    from fidget_tpu.render.render2d import PixelRenderer, _frame_unrolled_fn

    N = 1024
    tape = load_vm_tape("prospero.vm")
    r = PixelRenderer(tape, ImageSize(N, N))

    # first render settles the worklist capacity and compiles the
    # per-shape unrolled leaf (persistent-cached across processes)
    img = r.render_unrolled(tile_size=TILE)
    brute = r.render_brute()
    agreement = float((img.inside() == (brute < 0)).mean())
    if agreement < 0.9999:
        fail("FAILED occupancy agreement", agreement)
    ev = img.fill == 0
    close = np.isclose(img.distance[ev], brute[ev], rtol=1e-5, atol=1e-5)
    close |= np.isnan(img.distance[ev]) & np.isnan(brute[ev])
    if close.mean() < 0.9999:
        fail("FAILED distance agreement", close.mean())

    # the exact (frame fn, transform) pair being timed
    cap = r._ucap[TILE]
    n0x = n0y = N // TILE
    fn = _frame_unrolled_fn(
        id(r.tape), TILE, n0x, n0y, cap, r.n_inputs, False, r.interpret
    )
    tx = np.arange(n0x) * TILE
    gx, gy = np.meshgrid(tx, tx)
    x0 = jnp.asarray(gx.reshape(-1).astype(np.float32))
    y0 = jnp.asarray(gy.reshape(-1).astype(np.float32))
    mat = jnp.asarray(r._mat4(None))
    vec = jnp.zeros(r.n_inputs, jnp.float32)
    d0, f0, na0 = fn(x0, y0, mat, jnp.float32(0.0), vec)
    d0, f0 = np.asarray(d0)[:N, :N], np.asarray(f0)[:N, :N]
    inside0 = np.where(f0 == 0, d0 < 0, (f0 - 1) % 2 + 1 == 1)
    if abs(inside0.mean() - (brute < 0).mean()) > 1e-4:
        fail("FAILED timed-path occupancy guard", inside0.mean())
    if int(na0) > cap:
        fail("FAILED timed-path capacity guard", int(na0))

    # K frames per dispatch: with the fused leaf a frame is ~0.9 ms,
    # so the tunnel's ~28 ms dispatch latency needs a large batch to
    # amortize below the noise floor (at K=512 it adds ~0.06 ms/frame;
    # the K-slope probe demos/probe_r3_gap.py confirms the residual is
    # dispatch, not compute). Every frame still runs the full
    # pipeline with a per-frame-perturbed transform.
    K = 512

    def many(mat):
        def body(k, acc):
            m = mat * (1.0 + 1e-7 * k.astype(jnp.float32))
            dist, fill, na = fn(x0, y0, m, jnp.float32(0.0), vec)
            return acc + jnp.sum(dist) + na.astype(jnp.float32)

        return lax.fori_loop(0, K, body, jnp.float32(0.0))

    f = jax.jit(many)
    _ = float(f(mat))  # compile + warm
    best = float("inf")
    for i in range(3):
        t0 = time.time()
        _ = float(f(mat * (1.0 + 1e-6 * (i + 1))))
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
    print(json.dumps(record))


if __name__ == "__main__":
    main()
