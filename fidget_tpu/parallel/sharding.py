"""Multi-device rendering and parameter fitting.

The reference is single-node (rayon work-stealing,
fidget-core/src/render/config.rs:11-34); the TPU equivalent shards work
over a `jax.sharding.Mesh`:

- **rendering**: the tile/pixel grid is data-parallel — shard image
  rows over the mesh, each device evaluates its slab, no communication
  until assembly (`jax.lax.all_gather` only if a replicated image is
  required).
- **fitting** (the training-step analog): differentiable rendering of
  shape parameters; per-device pixel losses are reduced with `psum`, so
  parameter gradients are all-reduced over ICI exactly once per step —
  the standard DP pattern.

The differentiable path is the unrolled evaluator (eval/unrolled.py):
interval culling is control flow and intentionally carries no gradient
(SURVEY.md §3.5 — fills short-circuit gradients in the reference too).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..compiler.tape import Tape
from ..core.var import Var
from ..eval.arith import FloatMode
from ..eval.unrolled import eval_tape
from ..render.region import ImageSize, compose2


def make_mesh(n_devices: int | None = None, axis: str = "tiles") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _eval_rows(tape: Tape, mat, rows, W: int, z, params: dict):
    """Evaluates a slab of image rows (differentiably)."""
    cols = jnp.arange(W, dtype=jnp.float32)
    px, py = jnp.meshgrid(cols, rows)
    mx = mat[0, 0] * px + mat[0, 1] * py + mat[0, 2]
    my = mat[1, 0] * px + mat[1, 1] * py + mat[1, 2]
    fm = FloatMode(jnp)
    inputs = [None] * len(tape.var_map)
    for v, i in tape.var_map.items():
        if v == Var.X:
            inputs[i] = mx
        elif v == Var.Y:
            inputs[i] = my
        elif v == Var.Z:
            inputs[i] = jnp.full_like(mx, z)
        else:
            inputs[i] = jnp.full_like(mx, params[v])
    (d,), _ = eval_tape(tape, fm, inputs)
    return d


def render_sharded(
    tape: Tape,
    size: ImageSize,
    mesh: Mesh,
    *,
    world_to_model: np.ndarray | None = None,
    z: float = 0.0,
    params: dict | None = None,
):
    """Dense differentiable render with rows sharded over the mesh."""
    axis = mesh.axis_names[0]
    H, W = size.height, size.width
    assert H % mesh.devices.size == 0
    mat = jnp.asarray(compose2(world_to_model, size), jnp.float32)
    rows = jnp.arange(H, dtype=jnp.float32)
    rows = jax.device_put(rows, NamedSharding(mesh, P(axis)))

    @functools.partial(
        jax.jit,
        out_shardings=NamedSharding(mesh, P(axis, None)),
    )
    def run(rows):
        return _eval_rows(tape, mat, rows, W, jnp.float32(z), params or {})

    return run(rows)


def fit_step(
    tape: Tape,
    size: ImageSize,
    mesh: Mesh,
    params: dict,
    target,
    *,
    lr: float = 0.5,
    z: float = 0.0,
):
    """One data-parallel gradient-descent step on shape parameters.

    The image-row axis is sharded over the mesh; the scalar loss (and
    therefore every parameter gradient) is all-reduced with `psum`
    inside `shard_map`, overlapping reduction with the backward pass as
    XLA schedules it.

    Returns (new_params, loss).
    """
    axis = mesh.axis_names[0]
    H, W = size.height, size.width
    n_dev = mesh.devices.size
    assert H % n_dev == 0
    mat = jnp.asarray(compose2(None, size), jnp.float32)

    param_vars = sorted(params.keys(), key=lambda v: (v.kind, v.ident))
    theta = jnp.asarray([float(params[v]) for v in param_vars], jnp.float32)

    rows_all = jnp.arange(H, dtype=jnp.float32)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis, None)),
        out_specs=(P(), P()),
    )
    def grad_shard(theta, rows, tgt):
        def local_loss(theta):
            p = {v: theta[i] for i, v in enumerate(param_vars)}
            d = _eval_rows(tape, mat, rows, W, jnp.float32(z), p)
            return jnp.sum((d - tgt) ** 2) / (H * W)

        loss, g = jax.value_and_grad(local_loss)(theta)
        # `theta` is replicated (P()), so shard_map's AD already
        # all-reduces its cotangent across the mesh — `g` is the global
        # gradient; only the (varying) loss needs an explicit psum.
        return jax.lax.psum(loss, axis), g

    @jax.jit
    def step(theta, target):
        loss, g = grad_shard(theta, rows_all, target)
        return theta - lr * g, loss

    new_theta, loss = step(theta, jnp.asarray(target, jnp.float32))
    new_params = {v: new_theta[i] for i, v in enumerate(param_vars)}
    return new_params, float(loss)


def render_tiles_sharded(
    tape,
    size: ImageSize,
    mesh: Mesh,
    *,
    tile_sizes: Sequence[int] | None = None,
    world_to_model: np.ndarray | None = None,
    z: float = 0.0,
    vars: dict | None = None,
    pixel_perfect: bool = False,
    interpret: bool | None = None,
):
    """Full tiled MPR pipeline sharded over the mesh.

    Root-tile *rows* are distributed across devices; each device runs
    the complete per-tile pipeline (interval cull -> device tape
    simplification -> leaf evaluation) on its slab with **zero**
    cross-device communication — tile data-parallelism is embarrassingly
    parallel, exactly like the reference's rayon tile loop
    (fidget-raster/src/lib.rs:99-167), so scaling is linear up to the
    tile-row count. Returns an Image2D assembled from the sharded
    output.
    """
    from ..render.render2d import Image2D, PixelRenderer

    axis = mesh.axis_names[0]
    D = mesh.devices.size
    r = PixelRenderer(
        tape, size,
        tile_sizes=tuple(tile_sizes) if tile_sizes else None,
        interpret=interpret,
    )
    if r.n0y % D != 0:
        raise ValueError(
            f"root tile rows ({r.n0y}) must divide over {D} devices; "
            f"pick an image height that is a multiple of {r.T0 * D}"
        )
    mat = jnp.asarray(r._mat4(world_to_model))
    vec = jnp.asarray(r._var_vec(vars))
    x0 = jnp.asarray(r.tile_x0.reshape(r.n0y, r.n0x))
    y0 = jnp.asarray(r.tile_y0.reshape(r.n0y, r.n0x))

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axis, None), P(axis, None)),
        out_specs=(P(axis, None), P(axis, None)),
        # Pallas calls don't carry varying-mesh-axis metadata
        check_vma=False,
    )
    def run(mat, z, vec, x0s, y0s):
        return r._frame_tiles(
            mat, z, vec, x0s.reshape(-1), y0s.reshape(-1),
            pixel_perfect=pixel_perfect,
        )

    f = jax.jit(run)
    img, fill = f(mat, jnp.float32(z), vec, x0, y0)
    H, W = size.height, size.width
    return Image2D(
        np.asarray(img)[:H, :W], np.asarray(fill)[:H, :W]
    )


def render_voxels_sharded(
    tape,
    size,
    mesh: Mesh,
    *,
    world_to_model: np.ndarray | None = None,
    vars: dict | None = None,
    mode: str = "normals",
    tile_size: int = 64,
    sub_size: int = 16,
    interpret: bool | None = None,
    max_retries: int = 3,
):
    """Full 3D voxel pipeline sharded over the mesh.

    Root-tile *rows* (the image Y axis) distribute across devices; each
    device runs its complete slab — interval culls, per-level tape
    re-specialization, occlusion floor, voxel and normals passes — with
    zero cross-device communication (occlusion is per pixel column, so
    Y-slab sharding keeps it exact). Worklist capacity is per device;
    overflow retries recompile only the new capacity variant.
    """
    from ..render.render3d import Image3D, VoxelRenderer

    assert mode in ("normals", "heightmap")
    axis = mesh.axis_names[0]
    D = mesh.devices.size
    r = VoxelRenderer(
        tape, size, tile_size=tile_size, sub_size=sub_size,
        interpret=interpret,
    )
    if r.nty % D != 0:
        raise ValueError(
            f"tile rows ({r.nty}) must divide over {D} devices; pick an "
            f"image height that is a multiple of {tile_size * D}"
        )
    matM = jnp.asarray(r._mat4(world_to_model))
    vec = jnp.asarray(r._var_vec(vars))
    # (ty, tz, tx) major so y-slabs are contiguous for sharding
    shape3 = (r.ntz, r.nty, r.ntx)
    x0 = jnp.asarray(r.tile_x0.reshape(shape3).transpose(1, 0, 2))
    y0 = jnp.asarray(r.tile_y0.reshape(shape3).transpose(1, 0, 2))
    z0 = jnp.asarray(r.tile_z0.reshape(shape3).transpose(1, 0, 2))
    cap = min(max(256, r.cap // D), max(1, r.nsub // D))

    def make(cap):
        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P()) + (P(axis, None, None),) * 3,
            out_specs=(
                (P(axis, None), P(axis, None, None), P(axis))
                if mode == "normals"
                else (P(axis, None), None, P(axis))
            ),
            check_vma=False,
        )
        def run(matM, vec, x0s, y0s, z0s):
            # back to the core's (tz, ty_local, tx) row-major order
            def flat(a):
                return a.transpose(1, 0, 2).reshape(-1)

            depth, normal, n_active = r._frame_tiles(
                matM, vec, flat(x0s), flat(y0s), flat(z0s),
                mode=mode, cap=cap,
            )
            return depth, normal, n_active.reshape(1)

        return jax.jit(run)

    for _ in range(max_retries + 1):
        depth, normal, n_active = make(cap)(matM, vec, x0, y0, z0)
        worst = int(np.max(np.asarray(n_active)))
        if worst <= cap:
            break
        cap = min(1 << (worst - 1).bit_length(), r.nsub // D)
    return Image3D(
        np.asarray(depth),
        None if normal is None else np.asarray(normal),
    )
