"""fidget_tpu — a TPU-native framework for complex closed-form implicit
surfaces, with the capabilities of mkeeter/fidget.

Expression graphs are deduplicated and lowered to fidget's canonical
bytecode tape format, then batch-evaluated in point / interval /
forward-gradient modes across pixel/voxel lanes on the TPU VPU.
Interval evaluation over screen tiles and octree cells drives tape
simplification and subdivision (the MPR algorithm), feeding 2D
rendering, 3D heightmap+normal rendering, and Manifold Dual Contouring
meshing — all expressed in JAX so pixel gradients with respect to shape
parameters flow through the evaluator via autodiff.
"""

import os as _os

import jax as _jax

# Persistent XLA compilation cache: the compiled-per-shape evaluators
# (unrolled 2D leaf, dense mode) cost 1-3 min of XLA:TPU compile per
# (shape, size) — cached, a shape compiles once EVER per machine and
# subsequent processes load it in seconds (the interactive-compile
# story of the reference's machine-code JIT, amortized differently).
# Opt out with FIDGET_TPU_NO_CACHE=1; an explicit user-set cache dir
# is respected.
if _os.environ.get("FIDGET_TPU_NO_CACHE") != "1":
    try:
        if not _jax.config.jax_compilation_cache_dir:
            _jax.config.update(
                "jax_compilation_cache_dir",
                _os.path.expanduser("~/.cache/fidget_tpu_xla"),
            )
            _jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 2.0
            )
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from .core.context import Context
from .core.ops import BinaryOp, UnaryOp
from .core.tree import Tree, tree_max, tree_min
from .core.var import Var, VarMap
from .compiler.lower import lower
from .compiler.simplify import simplify
from .compiler.tape import Tape, TapeOp
from .shape import BoundShape, Shape, ShapeVars

__version__ = "0.1.0"

#: lazy top-level re-exports (PEP 562): the renderers/mesher pull in
#: the Pallas kernels, so they load on first use rather than at
#: package import
_LAZY = {
    "ImageSize": ("fidget_tpu.render.region", "ImageSize"),
    "VoxelSize": ("fidget_tpu.render.region", "VoxelSize"),
    "PixelRenderer": ("fidget_tpu.render.render2d", "PixelRenderer"),
    "VoxelRenderer": ("fidget_tpu.render.render3d", "VoxelRenderer"),
    "render2d": ("fidget_tpu.render.render2d", "render"),
    "render3d": ("fidget_tpu.render.render3d", "render"),
    "build_mesh": ("fidget_tpu.mesh", "build_mesh"),
    "MeshSettings": ("fidget_tpu.mesh", "Settings"),
    "eval_script": ("fidget_tpu.script", "eval_script"),
    "solve": ("fidget_tpu.solver", "solve"),
    "CancelToken": ("fidget_tpu.render.config", "CancelToken"),
}


def __getattr__(name: str):
    spec = _LAZY.get(name)
    if spec is None:
        raise AttributeError(f"module 'fidget_tpu' has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(spec[0]), spec[1])


def __dir__():
    return sorted(list(globals()) + list(_LAZY))


__all__ = [
    "BinaryOp",
    "BoundShape",
    "CancelToken",
    "Context",
    "ImageSize",
    "MeshSettings",
    "PixelRenderer",
    "Shape",
    "ShapeVars",
    "Tape",
    "TapeOp",
    "Tree",
    "UnaryOp",
    "Var",
    "VarMap",
    "VoxelRenderer",
    "VoxelSize",
    "build_mesh",
    "eval_script",
    "lower",
    "render2d",
    "render3d",
    "simplify",
    "solve",
    "tree_max",
    "tree_min",
    "__version__",
]
