"""Run the shard_map render paths on REAL TPU hardware (1-device mesh).

VERDICT r3 item 7: every sharding proof so far executed on the
8-device CPU emulation mesh (interpret-mode Pallas). This probe runs
the sharded 2D pipelines (interpreter + unrolled) and the sharded 3D
strata pipeline on a jax.sharding.Mesh over the single physical TPU
chip with interpret=False, asserting exact agreement with the
unsharded render, and writes SHARDED_TPU_r04.json.

Holds the chip; run alone.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax

from fidget_tpu.io.models import load_vm_tape
from fidget_tpu.parallel.sharding import (
    make_mesh,
    render_tiles_sharded,
    render_unrolled_sharded,
    render_voxels_sharded,
)
from fidget_tpu.render.region import ImageSize, VoxelSize
from fidget_tpu.render.render2d import PixelRenderer
from fidget_tpu.render.render3d import VoxelRenderer

OUT = "/root/repo/SHARDED_TPU_r04.json"


def main():
    dev = jax.devices()
    record = {"devices": [str(d) for d in dev], "checks": []}
    mesh = make_mesh(1)
    N = 256

    tape = load_vm_tape("prospero.vm")
    r = PixelRenderer(tape, ImageSize(N, N))

    t0 = time.time()
    img_s = render_tiles_sharded(tape, ImageSize(N, N), mesh)
    img = r.render()
    ok = bool(np.array_equal(img_s.inside(), img.inside()))
    record["checks"].append({
        "check": "2D interpreter shard_map vs unsharded (exact occupancy)",
        "ok": ok, "s": round(time.time() - t0, 1),
    })
    assert ok

    t0 = time.time()
    img_u = render_unrolled_sharded(tape, ImageSize(N, N), mesh)
    ok = bool(np.array_equal(img_u.inside(), img.inside()))
    record["checks"].append({
        "check": "2D unrolled shard_map vs unsharded (exact occupancy)",
        "ok": ok, "s": round(time.time() - t0, 1),
    })
    assert ok

    t3 = load_vm_tape("tanglecube.vm")
    v = VoxelRenderer(t3, VoxelSize(128, 128, 128), tile_size=32,
                      sub_size=8)
    t0 = time.time()
    hm = v.render(mode="heightmap")
    hs = render_voxels_sharded(t3, VoxelSize(128, 128, 128), mesh,
                               tile_size=32, sub_size=8,
                               mode="heightmap")
    ok = bool(np.array_equal(hm.depth, hs.depth))
    record["checks"].append({
        "check": "3D strata shard_map vs unsharded (exact depth)",
        "ok": ok, "s": round(time.time() - t0, 1),
    })
    assert ok

    record["all_ok"] = all(c["ok"] for c in record["checks"])
    with open(OUT, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
