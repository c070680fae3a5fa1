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


def _to_host(a) -> np.ndarray:
    """Device array -> host numpy, multi-process safe.

    Under `jax.distributed` each process only holds its addressable
    shards, so a plain np.asarray on a sharded global array raises;
    process_allgather replicates the value across hosts first (bulk
    image rows ride the ICI/DCN allgather exactly once)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(a, tiled=True))
    return np.asarray(a)


def make_mesh(n_devices: int | None = None, axis: str = "tiles") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


#: jitted-frame cache for the sharded entry points. jit's cache is
#: keyed on function identity, and these wrappers used to rebuild
#: their shard_map closures on every call — each frame/training step
#: paid a full retrace (and, without the persistent compile cache, a
#: full XLA recompile).
_FN_CACHE: dict = {}
#: pins objects referenced by id() in _FN_CACHE keys so a freed
#: tape's id cannot be recycled into a stale cache hit
_PIN: dict[int, object] = {}


def _mesh_key(mesh: Mesh):
    return (
        tuple(int(d.id) for d in mesh.devices.flat),
        tuple(mesh.axis_names),
    )


def _cached(key, pin, build):
    fn = _FN_CACHE.get(key)
    if fn is None:
        for obj in pin:
            _PIN.setdefault(id(obj), obj)
        fn = _FN_CACHE[key] = build()
    return fn


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


def _eval_rows_interp(tape, packed, mat, rows, W: int, z, params: dict,
                      interpret: bool):
    """Evaluates a slab of image rows through the Pallas float
    interpreter — the zero-recompile path, differentiable in both
    modes via interp_float's custom JVP (reverse mode backs
    fit_step(pipeline="interp"))."""
    from ..eval.pallas_interp import interp_float

    R = rows.shape[0]
    K = R * W
    s0 = max(8, -(-(-(-K // 128)) // 8) * 8)  # ceil(K/128) up to 8n
    cols = jnp.arange(W, dtype=jnp.float32)
    px, py = jnp.meshgrid(cols, rows)
    mx = mat[0, 0] * px + mat[0, 1] * py + mat[0, 2]
    my = mat[1, 0] * px + mat[1, 1] * py + mat[1, 2]
    V = max(1, len(tape.var_map))
    planes = [jnp.zeros((R, W), jnp.float32)] * V
    for v, i in tape.var_map.items():
        if v == Var.X:
            planes[i] = mx
        elif v == Var.Y:
            planes[i] = my
        elif v == Var.Z:
            planes[i] = jnp.full_like(mx, z)
        else:
            planes[i] = jnp.full_like(mx, params[v])
    # pad lanes REPLICATE the last real pixel: zero-padding can land on
    # a field kink (e.g. sqrt at the origin) whose infinite Jacobian
    # turns the padded lanes' zero cotangent into NaN in reverse mode
    pad = s0 * 128 - K
    flat = [
        jnp.concatenate(
            [p.reshape(-1),
             jnp.broadcast_to(p.reshape(-1)[-1], (pad,))]
        ).reshape(s0, 128)
        for p in planes
    ]
    vars_ = jnp.stack(flat)[None]  # [1, V, s0, 128]
    from ..eval.pallas_interp import _N_OPS, tape_n_ops

    nf = tape.reg_count + tape.mem_count
    out = interp_float(
        jnp.asarray(packed.w1), jnp.asarray(packed.w2),
        jnp.asarray(packed.imm), jnp.asarray(packed.lengths), vars_,
        nf=nf, n_inputs=V, n_outputs=1, s0=s0, interpret=interpret,
        n_ops=_N_OPS if interpret else tape_n_ops(tape),
    )
    return out[0, 0].reshape(-1)[:K].reshape(R, W)


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
    params = params or {}
    pvars = tuple(sorted(params.keys(), key=lambda v: (v.kind, v.ident)))

    def build():
        @functools.partial(
            jax.jit,
            out_shardings=NamedSharding(mesh, P(axis, None)),
        )
        def run(rows, mat, z, theta):
            p = {v: theta[i] for i, v in enumerate(pvars)}
            return _eval_rows(tape, mat, rows, W, z, p)

        return run

    run = _cached(
        ("dense", id(tape), W, H, pvars, _mesh_key(mesh)), (tape,), build
    )
    theta = (
        jnp.stack([jnp.asarray(params[v], jnp.float32) for v in pvars])
        if pvars else jnp.zeros(0, jnp.float32)
    )
    return run(rows, mat, jnp.float32(z), theta)


def fit_step(
    tape: Tape,
    size: ImageSize,
    mesh: Mesh,
    params: dict,
    target,
    *,
    lr: float = 0.5,
    z: float = 0.0,
    pipeline: str = "unrolled",
    interpret: bool | None = None,
):
    """One data-parallel gradient-descent step on shape parameters.

    The image-row axis is sharded over the mesh; the scalar loss (and
    therefore every parameter gradient) is all-reduced with `psum`
    inside `shard_map`, overlapping reduction with the backward pass as
    XLA schedules it.

    pipeline: "unrolled" (default) differentiates the whole-tape
    unrolled evaluator via native XLA autodiff; "interp" drives the
    ZERO-RECOMPILE Pallas float interpreter, whose custom JVP exposes
    a transposable Jacobian contraction so reverse mode works without
    per-shape compilation (pallas_interp.interp_float) — gradients
    match the unrolled path (tests/test_grad_parity.py).

    Returns (new_params, loss).
    """
    axis = mesh.axis_names[0]
    H, W = size.height, size.width
    n_dev = mesh.devices.size
    assert H % n_dev == 0
    assert pipeline in ("unrolled", "interp")
    if interpret is None:
        from ..eval.pallas_interp import default_interpret

        interpret = default_interpret()

    param_vars = tuple(sorted(params.keys(), key=lambda v: (v.kind, v.ident)))
    theta = jnp.asarray([float(params[v]) for v in param_vars], jnp.float32)

    def build():
        mat = jnp.asarray(compose2(None, size), jnp.float32)
        rows_all = jnp.arange(H, dtype=jnp.float32)
        if pipeline == "interp":
            from ..compiler.pack import pack_tapes

            packed = pack_tapes([tape])
        else:
            packed = None

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis, None)),
            out_specs=(P(), P()),
            # pallas_call outputs carry no vma annotation; the explicit
            # psums below make the outputs replicated by construction
            # (gradient parity with check_vma=True is pinned by
            # tests/test_grad_parity.py::test_fit_step_interp_...)
            check_vma=pipeline != "interp",
        )
        def grad_shard(theta, rows, tgt):
            def local_loss(theta):
                p = {v: theta[i] for i, v in enumerate(param_vars)}
                if pipeline == "interp":
                    d = _eval_rows_interp(
                        tape, packed, mat, rows, W, jnp.float32(z), p,
                        interpret,
                    )
                else:
                    d = _eval_rows(tape, mat, rows, W, jnp.float32(z), p)
                return jnp.sum((d - tgt) ** 2) / (H * W)

            loss, g = jax.value_and_grad(local_loss)(theta)
            if pipeline == "interp":
                # with check_vma off, shard_map AD does not know theta
                # was replicated: all-reduce its cotangent explicitly
                g = jax.lax.psum(g, axis)
            # `theta` is replicated (P()), so shard_map's AD already
            # all-reduces its cotangent across the mesh — `g` is the
            # global gradient; only the (varying) loss needs an
            # explicit psum.
            return jax.lax.psum(loss, axis), g

        @jax.jit
        def step(theta, target):
            loss, g = grad_shard(theta, rows_all, target)
            return theta - lr * g, loss

        return step

    step = _cached(
        ("fit", id(tape), W, H, param_vars, float(lr), float(z),
         pipeline, bool(interpret), _mesh_key(mesh)),
        (tape,), build,
    )
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
    ts_key = tuple(tile_sizes) if tile_sizes else None
    r = _cached(
        ("tiles-r", id(tape), size.width, size.height, ts_key, interpret),
        (tape,),
        lambda: PixelRenderer(
            tape, size, tile_sizes=ts_key, interpret=interpret
        ),
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

    def build():
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

        return jax.jit(run)

    f = _cached(
        ("tiles", id(tape), size.width, size.height, ts_key, interpret,
         pixel_perfect, _mesh_key(mesh)),
        (tape,), build,
    )
    img, fill = f(mat, jnp.float32(z), vec, x0, y0)
    H, W = size.height, size.width
    return Image2D(
        _to_host(img)[:H, :W], _to_host(fill)[:H, :W]
    )


def render_unrolled_sharded(
    tape,
    size: ImageSize,
    mesh: Mesh,
    *,
    world_to_model: np.ndarray | None = None,
    z: float = 0.0,
    vars: dict | None = None,
    tile_size: int = 8,
    cap: int | None = None,
    interpret: bool | None = None,
    max_retries: int = 3,
    _debug_counts: bool = False,
):
    """Tiled-unrolled 2D render with POST-CULL LOAD REBALANCING.

    The static-slab pipelines shard tile rows with zero communication,
    which strands devices whose slab culls to nothing (a scene whose
    geometry lands in one slab leaves D-1 devices idle). This is the
    TPU analog of the reference's rayon work-stealing
    (fidget-raster/src/lib.rs:99-167), expressed with collectives:

    1. each device interval-culls its OWN tile-row slab;
    2. `all_gather` of the per-tile active flags (n0 bytes over ICI);
    3. every device deterministically compacts the SAME global active
       list and takes its equal C/D slice — perfect balance regardless
       of where the geometry landed;
    4. each device unroll-evaluates its slice (the expensive stage);
    5. `all_gather` of the C/D distance blocks (the only bulk
       exchange, ~C*T^2*4 bytes) lets every device assemble its own
       image slab.

    Returns an Image2D; worklist overflow retries with a larger
    capacity bucket exactly like the single-device path.
    """
    from ..render.render2d import (
        _register_tape,
        _unrolled_cull_stage,
        _unrolled_leaf_stage,
        FILL_INSIDE,
        FILL_NONE,
        FILL_OUTSIDE,
        Image2D,
        PixelRenderer,
    )

    axis = mesh.axis_names[0]
    D = mesh.devices.size
    T0 = int(tile_size)
    r = _cached(
        ("u2d-r", id(tape), size.width, size.height, interpret),
        (tape,),
        lambda: PixelRenderer(tape, size, interpret=interpret),
    )
    n0x = -(-size.width // T0)
    n0y = -(-size.height // T0)
    n0 = n0x * n0y
    if n0y % D != 0:
        raise ValueError(
            f"tile rows ({n0y}) must divide over {D} devices; pick an "
            f"image height that is a multiple of {T0 * D}"
        )
    key = id(r.tape)
    _register_tape(key, lambda: (
        r.tape, r.packed_b, r.axis_of, r.nf_b, r.cw_b,
    ))
    n0_loc = n0 // D
    tx = np.arange(n0x) * T0
    ty = np.arange(n0y) * T0
    gx, gy = np.meshgrid(tx, ty)
    x0g = gx.reshape(-1).astype(np.float32)
    y0g = gy.reshape(-1).astype(np.float32)
    x0 = jnp.asarray(x0g.reshape(n0y, n0x))
    y0 = jnp.asarray(y0g.reshape(n0y, n0x))
    mat = jnp.asarray(r._mat4(world_to_model))
    vec = jnp.asarray(r._var_vec(vars))
    V = r.n_inputs

    def bucket(n):
        q = max(128, -(-n0 // 8))
        c = min(-(-max(int(n), 1) // q) * q, n0)
        return -(-c // D) * D  # divisible slices per device

    if cap is None:
        cap = bucket(max(n0 // 2, 1))

    def make(C):
        C_loc = C // D

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(axis, None), P(axis, None)),
            out_specs=(P(axis, None), P(axis, None), P(), P(axis)),
            check_vma=False,
        )
        def run(mat, z, vec, x0s, y0s):
            d = jax.lax.axis_index(axis)
            x0f = x0s.reshape(-1)
            y0f = y0s.reshape(-1)
            # 1) cull my slab
            root_in, root_out = _unrolled_cull_stage(
                key, T0, n0_loc, V, x0f, y0f, mat, z, vec,
                r.interpret,
            )
            act_loc = ~(root_in | root_out)
            # 2) exchange flags; 3) identical global compaction
            act = jax.lax.all_gather(act_loc, axis, tiled=True)  # [n0]
            n_active = act.sum()
            order = jnp.argsort(~act, stable=True)[:C]
            # round-robin deal: active tiles sit at the FRONT of the
            # compacted order, so contiguous slices would hand them all
            # to device 0 — strided columns balance any skew
            my = order[jnp.arange(C_loc) * D + d]
            my_valid = act[my]
            # 4) evaluate my balanced slice (global tile coords are
            # static constants, gatherable on every device)
            cx0 = jnp.asarray(x0g)[my]
            cy0 = jnp.asarray(y0g)[my]
            dist_loc = _unrolled_leaf_stage(
                key, T0, cx0, cy0, my_valid, mat, z, vec
            )  # [C_loc, pp]
            # 5) exchange results; assemble my image slab
            dist_all = jax.lax.all_gather(
                dist_loc, axis, tiled=True
            )  # [C, pp]
            # global slot of compacted position p after the tiled
            # all_gather of round-robin slices: device (p % D) holds it
            # at local row p // D
            pos = jnp.arange(C, dtype=jnp.int32)
            slot_vals = (pos % D) * C_loc + pos // D
            slot_of = (
                jnp.full(n0, C, jnp.int32)
                .at[order]
                .set(jnp.where(act[order], slot_vals, C))
            )
            slot_loc = jax.lax.dynamic_slice(
                slot_of, (d * n0_loc,), (n0_loc,)
            )
            dist_pad = jnp.concatenate(
                [dist_all, jnp.zeros((1, T0 * T0), jnp.float32)], axis=0
            )
            slab = dist_pad[slot_loc].reshape(n0y // D, n0x, T0, T0)
            img = slab.transpose(0, 2, 1, 3).reshape(
                (n0y // D) * T0, n0x * T0
            )
            fill_tile = jnp.where(
                act_loc,
                np.int8(FILL_NONE),
                jnp.where(
                    root_in, np.int8(FILL_INSIDE), np.int8(FILL_OUTSIDE)
                ),
            ).astype(jnp.int8)
            fill = jnp.repeat(
                jnp.repeat(fill_tile.reshape(n0y // D, n0x), T0, 0),
                T0, 1,
            )
            return img, fill, n_active, my_valid.sum().reshape(1)

        return jax.jit(run)

    for _ in range(max_retries + 1):
        fn = _cached(
            ("u2d", key, T0, n0x, n0y, V, int(cap), r.interpret,
             _mesh_key(mesh)),
            (tape,), lambda: make(cap),
        )
        img, fill, n_active, counts = fn(
            mat, jnp.float32(z), vec, x0, y0
        )
        if int(n_active) <= cap or cap >= n0:
            break
        cap = bucket(int(n_active))
    H, W = size.height, size.width
    out = Image2D(_to_host(img)[:H, :W], _to_host(fill)[:H, :W])
    if _debug_counts:
        return out, _to_host(counts)
    return out


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
    leaf: str = "interp",
    proofs: str = "interp",
):
    """Full 3D voxel pipeline sharded over the mesh.

    Root-tile *rows* (the image Y axis) distribute across devices; each
    device runs its complete slab — interval culls, per-level tape
    re-specialization, occlusion floor, voxel and normals passes — with
    zero cross-device communication (occlusion is per pixel column, so
    Y-slab sharding keeps it exact). Worklist capacity is per device;
    overflow retries recompile only the new capacity variant.
    leaf/proofs pass through to VoxelRenderer: "unrolled" shards the
    tiled-unrolled 3D pipeline instead of the interpreter one.
    """
    from ..render.render3d import Image3D, VoxelRenderer

    assert mode in ("normals", "heightmap")
    axis = mesh.axis_names[0]
    D = mesh.devices.size
    r = _cached(
        ("v3d-r", id(tape), size.width, size.height, size.depth,
         tile_size, sub_size, interpret, leaf, proofs),
        (tape,),
        lambda: VoxelRenderer(
            tape, size, tile_size=tile_size, sub_size=sub_size,
            interpret=interpret, leaf=leaf, proofs=proofs,
        ),
    )
    if r.nty % D != 0:
        raise ValueError(
            f"tile rows ({r.nty}) must divide over {D} devices; pick an "
            f"image height that is a multiple of {tile_size * D}"
        )
    # each device traces ONE fused-scan program over its slab; any
    # slab size is fine (the former >512^3 refusal guarded an XLA:TPU
    # fault that turned out to be the liveness-kernel OOB write fixed
    # in f56c4a6 — demos/probe_fused_1024.py verified the fused
    # drivers bit-exact at 1024^3 on hardware, 2026-08-20).
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
        fn = _cached(
            ("v3d", id(tape), size.width, size.height, size.depth,
             tile_size, sub_size, interpret, leaf, proofs, mode,
             int(cap), _mesh_key(mesh)),
            (tape,), lambda: make(cap),
        )
        depth, normal, n_active = fn(matM, vec, x0, y0, z0)
        worst = int(np.max(np.asarray(n_active)))
        if worst <= cap:
            break
        cap = min(1 << (worst - 1).bit_length(), r.nsub // D)
    return Image3D(
        np.asarray(depth),
        None if normal is None else np.asarray(normal),
    )
