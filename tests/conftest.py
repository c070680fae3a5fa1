"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated on emulated host devices
(the standard XLA_FLAGS=--xla_force_host_platform_device_count trick);
real-TPU kernels are exercised separately by bench.py / the driver.

Note: the environment may pre-register a TPU plugin and pin
`jax_platforms` via its own config update, so an env-var override is
not enough — we must call `jax.config.update` before any backend use.
"""

import os
import pathlib
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_backend_optimization_level" not in flags:
    # tests are compile-time bound, not runtime bound: XLA:CPU at -O0
    # compiles the interpret-mode pipelines ~35% faster with identical
    # results (measured: 64^3 voxel render cold 18.2 -> 12.1 s)
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the interpret-mode pipelines compile
# 5-15 s XLA:CPU programs per (shape-bucket, size); caching them across
# test processes cuts repeat suite runs several-fold on this 1-CPU box.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "FIDGET_TPU_TEST_CACHE",
        str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"),
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
