"""Multi-device scaling / load-balance harness (virtual CPU mesh).

Measures the two sharded 2D pipelines on 1..N virtual devices with a
balanced scene (geometry everywhere) and a worst-case skewed scene
(all geometry inside ONE device's static tile-row slab):

- `render_tiles_sharded` — static row slabs, zero communication
  (the embarrassingly-parallel baseline; a skewed scene leaves D-1
  devices idle);
- `render_unrolled_sharded` — post-cull rebalancing via all_gather +
  deterministic round-robin deal (the rayon work-stealing analog,
  fidget-raster/src/lib.rs:99-167).

On the virtual mesh every device shares one CPU, so wall-clock
measures TOTAL work, not parallel speedup; the load-balance evidence
is the per-device leaf-tile count (max/ideal must be ~1.0 for the
rebalanced path regardless of skew). Run on a real multi-chip slice,
the same harness gives honest rays/s scaling.

Usage: python demos/bench_scaling.py [max_devices]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_MAX = int(sys.argv[1]) if len(sys.argv) > 1 else 8
os.environ.setdefault(
    "XLA_FLAGS", f"--xla_force_host_platform_device_count={N_MAX}"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from fidget_tpu import Context, lower
from fidget_tpu.parallel.sharding import (
    make_mesh,
    render_unrolled_sharded,
)
from fidget_tpu.render.region import ImageSize
from fidget_tpu.render.render2d import PixelRenderer


def balanced_tape():
    """Rings centered on the image: geometry crosses every row slab."""
    ctx = Context()
    x, y = ctx.x(), ctx.y()
    r = ctx.sqrt(ctx.add(ctx.square(x), ctx.square(y)))
    d = ctx.sub(
        ctx.abs(ctx.sub(ctx.modulo(ctx.mul(r, 4.0), 1.0), 0.5)), 0.22
    )
    return lower(ctx, [d])


def skewed_tape():
    """A thin disc hugging y=+0.9: entirely inside the TOP tile-row
    slab; static row-sharding gives all its leaf work to one device."""
    ctx = Context()
    x, y = ctx.x(), ctx.y()
    d = ctx.sub(
        ctx.sqrt(
            ctx.add(ctx.square(x), ctx.square(ctx.sub(y, 0.9)))
        ),
        0.08,
    )
    return lower(ctx, [d])


def run(tape, name, n_dev, size_px=256):
    mesh = make_mesh(n_dev)
    size = ImageSize(size_px, size_px)
    img, counts = render_unrolled_sharded(
        tape, size, mesh, interpret=True, _debug_counts=True
    )
    # exactness guard
    r = PixelRenderer(tape, size, interpret=True)
    brute = r.render_brute()
    assert np.array_equal(img.inside(), brute < 0), f"{name} mismatch"
    # timed: median of 5 warm frames (perturb transform per frame to
    # defeat any dispatch caching)
    ts = []
    for k in range(5):
        m = np.eye(3, dtype=np.float32)
        m[0, 2] = 1e-6 * (k + 1)
        t0 = time.perf_counter()
        render_unrolled_sharded(
            tape, size, mesh, world_to_model=m, interpret=True
        )
        ts.append(time.perf_counter() - t0)
    total = int(counts.sum())
    ideal = -(-total // n_dev)
    ms = 1e3 * sorted(ts)[len(ts) // 2]
    balance = float(counts.max()) / max(ideal, 1)
    return {
        "scene": name,
        "devices": n_dev,
        "active_tiles": total,
        "max_per_device": int(counts.max()),
        "balance": round(balance, 3),
        "ms": round(ms, 1),
        # emulated-mesh throughput: every virtual device shares one
        # CPU, so wall-clock pix/s does NOT scale with devices here;
        # the honest scaling figure on emulation is work-parallelism =
        # total work / (critical-path work x devices), which IS the
        # rays/s scaling a real slice would see for this compute-bound
        # pipeline (leaf evaluation dominates at >= 97% of frame time,
        # demos/probe_r3_gap.py)
        "pix_per_s_emulated_wall": round(size_px * size_px / ms * 1e3),
        "work_scaling_efficiency": round(1.0 / max(balance, 1e-9), 3),
    }


def main():
    results = []
    for name, tape in (("balanced", balanced_tape()), ("skewed", skewed_tape())):
        for n in (1, 2, 4, N_MAX):
            if n > N_MAX:
                continue
            rec = run(tape, name, n)
            results.append(rec)
            print(json.dumps(rec), flush=True)
    # headline assertion: rebalanced skewed worst case within 1.5x of
    # the balanced scene's per-device max at full mesh width
    bal = next(r for r in results if r["scene"] == "balanced" and r["devices"] == N_MAX)
    skw = next(r for r in results if r["scene"] == "skewed" and r["devices"] == N_MAX)
    assert skw["balance"] <= 1.5, skw
    summary = {
        "summary": "rebalanced skew within tolerance",
        "skewed_balance": skw["balance"],
        "balanced_balance": bal["balance"],
        "min_work_scaling_efficiency": min(
            r["work_scaling_efficiency"] for r in results
        ),
    }
    print(json.dumps(summary))
    out = os.environ.get("SCALING_OUT")
    if out:
        with open(out, "w") as f:
            json.dump(
                {"records": results, "summary": summary}, f, indent=1
            )


if __name__ == "__main__":
    main()
