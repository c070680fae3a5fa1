"""Multi-PROCESS mesh test: 2 x jax.distributed processes (4 virtual
CPU devices each) drive every sharded entry point across a real
process boundary with Gloo collectives — the CPU-emulated stand-in for
the multi-host TPU pod path (SURVEY.md §5 distributed-comm row).

The in-process 8-device shard_map tests live in test_sharding-style
files; this one proves the SAME library code runs when the mesh spans
processes: global-array outputs are allgathered host-side
(`sharding._to_host`), fit_step's psum crosses the boundary, and the
post-cull rebalance's all_gather exchanges flags between processes.
"""
import os
import socket
import subprocess
import sys

import pytest


def test_two_process_mesh():
    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out:\n" + "\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        tail = "\n".join(out.splitlines()[-25:])
        assert p.returncode == 0, f"worker {i} failed:\n{tail}"
        assert f"[{i}] ALL OK" in out, f"worker {i} incomplete:\n{tail}"
