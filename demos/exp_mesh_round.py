"""Decompose the fused-mesh collapse round + walk costs on TPU.

Monkeypatches DeviceVertexStore.merge_round with a timed version and
clocks the dual-walk sub-stages for a warm depth-8 colonnade build.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from fidget_tpu.io.models import load_vm_tape
from fidget_tpu.mesh import Settings, build_mesh
from fidget_tpu.mesh import fused
from fidget_tpu.mesh.fused import DeviceVertexStore, _bucket_half, _get_core, merge_core


def timed_merge_round(self, member_vids, seg_member, pbase, ps):
    t0 = time.perf_counter()
    K = len(pbase)
    M = len(member_vids)
    kcap = _bucket_half(K)
    self._ensure_ext(kcap)
    starts = np.searchsorted(seg_member, np.arange(K))
    slot = np.arange(M) - starts[seg_member]
    mv_p = np.full(kcap * 8, -1, np.int32)
    mv_p[seg_member * 8 + slot] = member_vids
    pb_p = np.zeros((3, kcap), np.int32)
    pb_p[:, :K] = pbase.T
    t1 = time.perf_counter()
    core = _get_core(
        self.ev, "merge", lambda: merge_core(self.ev, 0, kcap),
        kcap, self.cap,
    )
    up = (jnp.asarray(mv_p), jnp.asarray(pb_p))
    t2 = time.perf_counter()
    (self.qef, self.vpos, self.verr, self.vorig, packed) = core(
        self.qef, self.vpos, self.verr, self.vorig,
        up[0], up[1], jnp.int32(ps), jnp.float32(self.h),
        self.mat, self.vv, jnp.int32(self.ext_base),
    )
    t3 = time.perf_counter()
    p = np.asarray(packed)
    t4 = time.perf_counter()
    self._last = (self.ext_base, kcap)
    self.ext_base += kcap
    p = p[:K].astype(np.float64)
    print(f"    [round K={K}] host-prep {1e3*(t1-t0):.0f} "
          f"upload {1e3*(t2-t1):.0f} dispatch {1e3*(t3-t2):.0f} "
          f"force {1e3*(t4-t3):.0f} ms")
    return p[:, 0] > 0.5, p[:, 1:4], p[:, 4], p[:, 5]


def main():
    DeviceVertexStore.merge_round = timed_merge_round
    tape = load_vm_tape("colonnade.vm")
    build_mesh(tape, Settings(depth=8, eval="unrolled"))  # warm
    w = np.eye(4)
    w[0, 3] = 5e-6
    os.environ["FIDGET_MESH_TIMING"] = "1"
    import fidget_tpu.mesh as M
    M._TIMING = True

    # also wrap the walk-phase hot spots with a profiler
    import cProfile
    import pstats
    t0 = time.perf_counter()
    pr = cProfile.Profile()
    pr.enable()
    m = build_mesh(tape, Settings(depth=8, eval="unrolled",
                                  world_to_model=w))
    pr.disable()
    print(f"warm total {time.perf_counter()-t0:.2f} s "
          f"({len(m.vertices)} verts)")
    st = pstats.Stats(pr)
    st.sort_stats("tottime").print_stats(22)


if __name__ == "__main__":
    main()
