"""Mesh build timing + host-path profile on the real TPU.

Times colonnade MDC at a given depth, then cProfiles one build to show
where host time goes (device waits appear as jax blocking calls).

Usage: python demos/bench_mesh.py [depth] [--profile]
"""

import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from fidget_tpu.io.models import load_vm_tape
from fidget_tpu.mesh import Settings, build_mesh


def main():
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    tape = load_vm_tape("colonnade.vm")
    s = Settings(depth=depth)
    t0 = time.perf_counter()
    m = build_mesh(tape, s)
    cold = time.perf_counter() - t0
    best = np.inf
    for i in range(2):
        # perturb the transform so the dispatch cache can't shortcut
        w = np.eye(4)
        w[0, 3] = 1e-6 * (i + 1)
        t0 = time.perf_counter()
        m = build_mesh(tape, Settings(depth=depth, world_to_model=w))
        best = min(best, time.perf_counter() - t0)
    print(
        f"colonnade depth={depth}: cold {cold:.2f}s warm {best:.2f}s "
        f"({len(m.vertices)} verts, {len(m.triangles)} tris)"
    )
    if "--profile" in sys.argv:
        w = np.eye(4)
        w[0, 3] = 3e-6
        pr = cProfile.Profile()
        pr.enable()
        build_mesh(tape, Settings(depth=depth, world_to_model=w))
        pr.disable()
        st = pstats.Stats(pr)
        st.sort_stats("cumulative").print_stats(28)


if __name__ == "__main__":
    main()
