"""Pallas TPU tape-interpreter kernels.

The TPU-native replacement for both the reference's machine-code JIT
(fidget-jit) and its WGSL interpreter
(fidget-wgpu/src/voxel/shaders/tape_interpreter.wgsl:33-137): a generic
kernel, compiled ONCE per (mode, register-file, capacity) bucket, that
evaluates *any* packed tape. Tapes are data, so per-region simplified
tapes cost no recompilation — the property the whole MPR pipeline
rests on.

Execution model (one grid instance per tile, mirroring one workgroup
per tile on the GPU):

- the tile's packed tape (compiler/pack.py layout) sits in SMEM;
- the register file lives in VMEM as ``[NF, S0, 128]`` f32 planes
  (NF = registers + spill slots unified; lanes = S0*128 points);
- a `fori_loop` walks tape words: scalar decode, two dynamic
  register-file reads, one `lax.switch` over the op vocabulary
  (a single VPU op over all lanes), one dynamic write;
- value modes share their arithmetic with the host evaluators — the
  branch bodies call the same FloatMode/IntervalMode/GradMode methods
  (eval/arith.py), so kernel semantics are identical by construction;
- interval mode records 2-bit choices, 16 per int32 word, via
  read-or-write into a packed [CW, S0, 128] plane (the TPU analog of
  the wgpu choice stack, shaders/stack.wgsl).

All kernels run in interpret mode off-TPU, which is how the unit tests
exercise them on the CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..compiler.pack import IMM12
from ..compiler.tape import TapeOp
from .arith import FloatMode, GradMode, IntervalMode
from .softmath import kernel_namespace

#: ops 0..30 are kernel-dispatchable (MEM/LOAD/STORE are packed away)
_N_OPS = 31

_UNARY_OPS = [
    TapeOp.NEG, TapeOp.ABS, TapeOp.RECIP, TapeOp.SQRT, TapeOp.SQUARE,
    TapeOp.FLOOR, TapeOp.CEIL, TapeOp.ROUND, TapeOp.NOT, TapeOp.SIN,
    TapeOp.COS, TapeOp.TAN, TapeOp.ASIN, TapeOp.ACOS, TapeOp.ATAN,
    TapeOp.EXP, TapeOp.LN,
]
_PLAIN_BINARY_OPS = [
    TapeOp.ADD, TapeOp.SUB, TapeOp.MUL, TapeOp.DIV, TapeOp.ATAN2,
    TapeOp.COMPARE, TapeOp.MOD,
]
_CHOICE_OPS = [TapeOp.MIN, TapeOp.MAX, TapeOp.AND, TapeOp.OR]


def _decode(w1, w2):
    op = w1 & 127
    out = (w1 >> 7) & 0xFFF
    a = (w1 >> 19) & 0xFFF
    b = w2 & 0xFFF
    aux = w2 >> 12
    return op, out, a, b, aux


def _order_info(op_order, n_ops: int = _N_OPS):
    """Static helpers for a (possibly renumbered) opcode ordering.

    op_order: tuple position -> canonical TapeOp (None = identity).
    n_ops truncates the dispatch vocabulary to the first n_ops
    positions — the kernel's switch then carries only that many
    branches. TapeOp numbering is frequency-ordered and
    pack.frequency_op_order sorts a shape's hot ops first, so a tape
    using k distinct ops needs only k branches; the switch lowers to a
    predicated if-chain whose cost grows ~11 ns per BRANCH POSITION
    per step (demos/exp_position.py), so truncation cuts the
    interpreter's dominant per-step cost directly.

    Returns (canonical_at_pos, pos_of dict, choice_mask) where
    choice_mask has bit p set if position p holds a choice op."""
    if op_order is None:
        op_order = tuple(range(_N_OPS))
    op_order = tuple(op_order)[:n_ops]
    pos_of = {canon: pos for pos, canon in enumerate(op_order)}
    assert int(TapeOp.OUTPUT) in pos_of, "n_ops must cover OUTPUT"
    choice_mask = 0
    for cop in _CHOICE_OPS:
        if int(cop) in pos_of:
            choice_mask |= 1 << pos_of[int(cop)]
    return op_order, pos_of, choice_mask


def tape_n_ops(tape, op_order=None, *, floor: int = 8) -> int:
    """Dispatch-vocabulary size for a tape: 1 + the highest opcode
    position it uses (canonical numbering or a pack renumbering),
    rounded up to a multiple of 4 (>= floor) so kernel-compile buckets
    stay coarse.

    OUTPUT/INPUT/COPY are ALWAYS counted even when the tape has no
    such ops: min/max/and/or SIMPLIFY to COPY, so per-region child
    tapes introduce opcodes the parent lacks — under a frequency
    renumbering an unused COPY sorts past the truncation point and
    lax.switch would silently CLAMP it onto the last live branch
    (caught as 5-voxel depth drift at 1024^3 on hardware; interpret
    mode always runs the full vocabulary and cannot see it)."""
    ops = set(int(o) for o in np.asarray(tape.op))
    ops.discard(int(TapeOp.LOAD))
    ops.discard(int(TapeOp.STORE))
    ops.discard(int(TapeOp.MEM))
    ops |= {int(TapeOp.OUTPUT), int(TapeOp.INPUT), int(TapeOp.COPY)}
    if op_order is not None:
        pos_of = {int(c): p for p, c in enumerate(op_order)}
        hi = max(pos_of[o] for o in ops) if ops else 0
    else:
        hi = max(ops) if ops else 0
    return min(_N_OPS, max(floor, -(-(hi + 1) // 4) * 4))


def _build_branches(canonical_at_pos, fm, va, vb, input_fn):
    """Branch list in permuted position order; bodies keyed by the
    canonical op each position holds."""
    branches = []
    for canon in canonical_at_pos:
        canon = TapeOp(canon)
        if canon == TapeOp.INPUT:
            branches.append(input_fn)
        elif canon in _UNARY_OPS:
            branches.append(lambda canon=canon: fm.unary(canon, va))
        elif canon in _PLAIN_BINARY_OPS:
            branches.append(
                lambda canon=canon: fm.binary(canon, va, vb)
            )
        elif canon in _CHOICE_OPS:
            branches.append(
                lambda canon=canon: fm.choice_binary(canon, va, vb)[0]
            )
        else:  # OUTPUT / COPY / padding
            branches.append(lambda: va)
    return branches


def _tape_specs(lcap: int):
    """Block specs for (w1, w2, imm, lengths) arena inputs."""
    return [
        pl.BlockSpec((1, 1, lcap), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, lcap), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, lcap), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
    ]


def _prep_tape_args(w1, w2, imm, lengths):
    T = w1.shape[0]
    return (
        jnp.asarray(w1).reshape(T, 1, -1),
        jnp.asarray(w2).reshape(T, 1, -1),
        jnp.asarray(imm).reshape(T, 1, -1),
        jnp.asarray(lengths).reshape(T, 1, 1),
    )


# ======================================================================
# float mode


@functools.partial(
    jax.jit,
    static_argnames=(
        "nf", "n_inputs", "n_outputs", "s0", "interpret", "op_order",
        "n_ops",
    ),
)
def _interp_float_impl(
    w1, w2, imm, lengths, vars_, *, nf: int, n_inputs: int, n_outputs: int,
    s0: int, interpret: bool = False, op_order: tuple | None = None,
    n_ops: int = _N_OPS,
):
    """Evaluates packed tapes in bulk float mode (non-differentiable
    kernel body — the public `interp_float` adds the custom JVP).

    Args:
      w1/w2/imm: [T, L] packed arena (compiler/pack.py).
      lengths: [T] ops per tape.
      vars_: [T, V, S0, 128] f32 input planes (V = n_inputs).
      op_order: opcode renumbering the arena was packed with
        (pack.frequency_op_order); shortens the switch scan for the
        shape's hot ops at the cost of one kernel compile per order.
    Returns:
      [T, O, S0, 128] f32 outputs.
    """
    T, lcap = w1.shape
    fm = FloatMode(kernel_namespace(jnp), choice_dtype=jnp.int32)
    canonical_at_pos, pos_of, _ = _order_info(op_order, n_ops)
    out_pos = pos_of[int(TapeOp.OUTPUT)]

    def kernel(w1_ref, w2_ref, imm_ref, len_ref, vars_ref, out_ref, regs):
        n = len_ref[0, 0, 0]

        def step(j, _):
            op, out, a, b, aux = _decode(w1_ref[0, 0, j], w2_ref[0, 0, j])
            immv = imm_ref[0, 0, j]
            imm_plane = jnp.full((s0, 128), immv, jnp.float32)
            va = jnp.where(a == IMM12, imm_plane, regs[jnp.minimum(a, nf - 1)])
            vb = jnp.where(b == IMM12, imm_plane, regs[jnp.minimum(b, nf - 1)])
            aux_in = jnp.minimum(aux, n_inputs - 1)

            branches = _build_branches(
                canonical_at_pos, fm, va, vb,
                lambda: vars_ref[0, aux_in],
            )
            res = lax.switch(op, branches)

            @pl.when(op == out_pos)
            def _():
                out_ref[0, jnp.minimum(aux, n_outputs - 1)] = va

            regs[out] = res
            return 0

        lax.fori_loop(0, jnp.minimum(n, lcap), step, 0)

    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=_tape_specs(lcap)
        + [pl.BlockSpec((1, n_inputs, s0, 128), lambda i: (i, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, n_outputs, s0, 128), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, n_outputs, s0, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nf, s0, 128), jnp.float32)],
        interpret=interpret,
    )(*_prep_tape_args(w1, w2, imm, lengths), vars_)


@functools.lru_cache(maxsize=None)
def _float_diff_fn(nf, n_inputs, n_outputs, s0, interpret, op_order, n_ops):
    """Builds (and caches per static config) the custom-JVP wrapper
    that makes the float kernel forward-differentiable."""
    kw = dict(
        nf=nf, n_inputs=n_inputs, n_outputs=n_outputs, s0=s0,
        interpret=interpret, op_order=op_order, n_ops=n_ops,
    )

    @jax.custom_jvp
    def f(w1, w2, imm, lengths, vars_):
        return _interp_float_impl(w1, w2, imm, lengths, vars_, **kw)

    @f.defjvp
    def f_jvp(primals, tangents):
        w1, w2, imm, lengths, vars_ = primals
        dvars = tangents[4]
        # primal through the exact float kernel (the dual kernel's
        # value channel differs at NaN ties: GradMode min/max pick a
        # side where FloatMode propagates NaN)
        primal_out = f(w1, w2, imm, lengths, vars_)
        # Full input Jacobian J[t, o, i] via ceil(V/3) dual-kernel
        # passes with one-hot tangent channels (primal-only data),
        # then a contraction that is LINEAR in dvars through standard
        # jnp ops — so JAX can transpose the linearized JVP and
        # `jax.grad` works through the interpreter kernel (reverse
        # mode on the zero-recompile pipeline; V is tiny: x/y/z plus
        # a handful of ShapeVars, so the extra passes are bounded and
        # V <= 3 costs exactly the one pass the directional JVP did).
        cols = []
        for i0 in range(0, n_inputs, 3):
            kk = min(3, n_inputs - i0)
            e = np.zeros((3, n_inputs), np.float32)
            for c in range(kk):
                e[c, i0 + c] = 1.0
            chans = [vars_] + [
                jnp.broadcast_to(
                    jnp.asarray(e[c])[None, :, None, None], vars_.shape
                )
                for c in range(3)
            ]
            duals = jnp.stack(chans, axis=2)
            g = interp_grad(w1, w2, imm, lengths, duals, **kw)
            cols.append(g[:, :, 1:1 + kk])
        J = lax.stop_gradient(jnp.concatenate(cols, axis=2))
        # Kink/singularity columns (sqrt/abs/recip at their critical
        # points) carry NaN/inf partials; contracted against a ZERO
        # tangent they would turn irrelevant directions into NaN (the
        # reference has no reverse mode to define this — its grad-slice
        # consumers handle NaN explicitly). Clamp non-finite partials
        # to 0: derivatives on the measure-zero kink set read as 0
        # rather than poisoning every parameter through the psum.
        # The isfinite mask is primal data, so the contraction stays
        # LINEAR in dvars and JAX can transpose it for jax.grad.
        J = jnp.where(jnp.isfinite(J), J, 0.0)
        tangent_out = (J * dvars[:, None]).sum(axis=2)
        return primal_out, tangent_out

    return f


def interp_float(
    w1, w2, imm, lengths, vars_, *, nf: int, n_inputs: int, n_outputs: int,
    s0: int, interpret: bool = False, op_order: tuple | None = None,
    n_ops: int = _N_OPS,
):
    """Evaluates packed tapes in bulk float mode (see
    `_interp_float_impl` for the argument contract).

    Differentiable w.r.t. `vars_` in BOTH modes: the custom JVP
    computes the full input Jacobian through the dual-number kernel
    (`interp_grad`, ceil(V/3) passes with one-hot tangent channels)
    and contracts it with the tangent in transposable jnp ops — so
    `jax.jvp`/`jax.jacfwd`/`jax.linearize` AND `jax.grad`/`jax.vjp`
    all work through the zero-recompile interpreter pipeline (the
    north-star "gradients flow via JAX autodiff through the tape
    evaluator", BASELINE.md; reverse mode costs ceil(V/3) forward dual
    passes since the reference-style tape has no adjoint form).
    Tangents w.r.t. `imm` are dropped: tape immediates are
    compiler-baked constants, never parameters (parameters enter as
    Var input planes)."""
    return _float_diff_fn(
        nf, n_inputs, n_outputs, s0, interpret, op_order, n_ops
    )(w1, w2, imm, lengths, vars_)


# ======================================================================
# float mode fused with a per-column voxel depth reduction


@functools.partial(
    jax.jit,
    static_argnames=(
        "nf", "n_inputs", "s0", "sub", "interpret", "op_order",
        "tiles_per_step", "n_ops",
    ),
)
def _interp_voxel_depth_impl(
    w1, w2, imm, lengths, vars_, *, nf: int, n_inputs: int, s0: int,
    sub: int, interpret: bool = False, op_order: tuple | None = None,
    tiles_per_step: int = 1, n_ops: int = _N_OPS,
):
    """Float-evaluates packed tapes over one subtile's voxels and
    reduces to per-pixel-column local surface depths inside the kernel.

    Lanes are the subtile's voxels in (vz, vy, vx) row-major order
    (sub**3 == s0*128 exactly). The epilogue computes, per (vy, vx)
    column, ``max over vz of (dist < 0 ? vz + 1 : 0)`` — the voxel.rs
    "deepest interior voxel" rule (fidget-raster/src/voxel.rs:443-445)
    — so the kernel's output is [T, PP, 128] local depths (PP =
    sub**2/128 column planes, padded to >= 8) instead of a full
    [T, sub**3] distance volume. Culled tapes (length 0) produce depth
    0 everywhere: the distance scratch is initialised positive.

    Requires sub**2 % 128 == 0 (sub in {16, 32, 64...}); callers fall
    back to interp_float + an XLA reduce for smaller subtiles.

    tiles_per_step > 1 processes that many tiles per Pallas grid step
    (an inner serial loop over the block), amortizing the ~2 us fixed
    per-grid-step dispatch cost across tiles — the voxel pass runs one
    instance per compacted subtile, so at cap ~4k the overhead alone is
    ~8 ms. T is padded to a multiple internally; padded tiles have
    length 0 and produce depth 0.
    """
    T, lcap = w1.shape
    assert sub * sub % 128 == 0 and sub**3 == s0 * 128
    g = max(1, int(tiles_per_step))
    if T % g:
        padn = g - T % g
        w1 = jnp.concatenate([w1, jnp.zeros((padn, lcap), w1.dtype)])
        w2 = jnp.concatenate([w2, jnp.zeros((padn, lcap), w2.dtype)])
        imm = jnp.concatenate([imm, jnp.zeros((padn, lcap), jnp.float32)])
        lengths = jnp.concatenate(
            [lengths, jnp.zeros((padn,), lengths.dtype)]
        )
        vars_ = jnp.concatenate(
            [vars_, jnp.zeros((padn,) + vars_.shape[1:], vars_.dtype)]
        )
        Tp = T + padn
    else:
        Tp = T
    pp = (sub * sub) // 128          # planes per z-slice
    pp_out = max(8, pp)              # padded output planes
    fm = FloatMode(kernel_namespace(jnp), choice_dtype=jnp.int32)
    canonical_at_pos, pos_of, _ = _order_info(op_order, n_ops)
    out_pos = pos_of[int(TapeOp.OUTPUT)]

    def kernel(w1_ref, w2_ref, imm_ref, len_ref, vars_ref, out_ref, regs, dist):
        def tile_body(t, _):
            n = len_ref[t, 0, 0]
            dist[...] = jnp.ones((s0, 128), jnp.float32)

            def step(j, _):
                op, out, a, b, aux = _decode(w1_ref[t, 0, j], w2_ref[t, 0, j])
                immv = imm_ref[t, 0, j]
                imm_plane = jnp.full((s0, 128), immv, jnp.float32)
                va = jnp.where(
                    a == IMM12, imm_plane, regs[jnp.minimum(a, nf - 1)]
                )
                vb = jnp.where(
                    b == IMM12, imm_plane, regs[jnp.minimum(b, nf - 1)]
                )
                aux_in = jnp.minimum(aux, n_inputs - 1)

                branches = _build_branches(
                    canonical_at_pos, fm, va, vb,
                    lambda: vars_ref[t, aux_in],
                )
                res = lax.switch(op, branches)

                @pl.when(op == out_pos)
                def _():
                    dist[...] = va

                regs[out] = res
                return 0

            lax.fori_loop(0, jnp.minimum(n, lcap), step, 0)

            # depth-reduce epilogue: planes [vz*pp + q] hold z-slice vz.
            # Static unroll for small subtiles (measured path); a
            # fori_loop above 16 z-slices keeps kernel size bounded for
            # sub=32/64.
            if sub <= 16:
                acc = jnp.zeros((pp, 128), jnp.int32)
                for vz in range(sub):
                    block = dist[vz * pp:(vz + 1) * pp, :]
                    acc = jnp.maximum(
                        acc, jnp.where(block < 0.0, jnp.int32(vz + 1), 0)
                    )
            else:
                def zstep(vz, acc):
                    block = dist[pl.ds(vz * pp, pp), :]
                    return jnp.maximum(
                        acc, jnp.where(block < 0.0, vz + 1, 0)
                    )

                acc = lax.fori_loop(
                    0, sub, zstep, jnp.zeros((pp, 128), jnp.int32)
                )
            if pp == pp_out:
                out_ref[t] = acc
            else:
                out_ref[t] = jnp.concatenate(
                    [acc, jnp.zeros((pp_out - pp, 128), jnp.int32)], axis=0
                )
            return 0

        if g == 1:
            tile_body(0, 0)
        else:
            lax.fori_loop(0, g, tile_body, 0)

    out = pl.pallas_call(
        kernel,
        grid=(Tp // g,),
        in_specs=[
            pl.BlockSpec((g, 1, lcap), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((g, 1, lcap), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((g, 1, lcap), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((g, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((g, n_inputs, s0, 128), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((g, pp_out, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Tp, pp_out, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((nf, s0, 128), jnp.float32),
            pltpu.VMEM((s0, 128), jnp.float32),
        ],
        interpret=interpret,
    )(*_prep_tape_args(w1, w2, imm, lengths), vars_)
    return out[:T]


@functools.lru_cache(maxsize=None)
def _voxel_depth_nondiff_fn(nf, n_inputs, s0, sub, interpret, op_order,
                            tiles_per_step, n_ops):
    kw = dict(
        nf=nf, n_inputs=n_inputs, s0=s0, sub=sub, interpret=interpret,
        op_order=op_order, tiles_per_step=tiles_per_step, n_ops=n_ops,
    )

    @jax.custom_jvp
    def f(w1, w2, imm, lengths, vars_):
        return _interp_voxel_depth_impl(w1, w2, imm, lengths, vars_, **kw)

    @f.defjvp
    def f_jvp(primals, tangents):
        out = f(*primals)
        # integer depths: piecewise constant in the inputs -> float0
        return out, np.zeros(out.shape, dtype=jax.dtypes.float0)

    return f


def interp_voxel_depth(
    w1, w2, imm, lengths, vars_, *, nf: int, n_inputs: int, s0: int,
    sub: int, interpret: bool = False, op_order: tuple | None = None,
    tiles_per_step: int = 1, n_ops: int = _N_OPS,
):
    """Fused voxel float-eval + per-column depth reduction (see
    `_interp_voxel_depth_impl` for the contract). The integer depth
    output is piecewise constant in the inputs, so its JVP is defined
    as zero — surface-position gradients come from the normals pass
    (`interp_grad` duals), matching the reference's split (voxel.rs
    depths are u32; gradients only ever come from grad-mode evals)."""
    return _voxel_depth_nondiff_fn(
        nf, n_inputs, s0, sub, interpret, op_order, tiles_per_step, n_ops
    )(w1, w2, imm, lengths, vars_)


# ======================================================================
# float mode over a shared tape with per-tile action codes


@functools.partial(
    jax.jit, static_argnames=("nf", "n_inputs", "n_outputs", "s0", "interpret")
)
def interp_float_coded(
    w1, w2, imm, lengths, codes, vars_, *, nf: int, n_inputs: int,
    n_outputs: int, s0: int, interpret: bool = False,
):
    """Bulk float evaluation of ONE shared tape, specialized per tile by
    packed action codes instead of materialized child tapes.

    The 2-bit codes from the liveness kernel (simplify_device.py)
    annotate every parent op per tile: 0 = skip, 1 = execute, 2/3 =
    execute as COPY from operand a/b. Skipping costs a couple of scalar
    ops, so a tile whose trace kills 80% of the tape runs ~5x fewer
    vector ops with zero compaction work — fixed shapes, no scatters.

    Args:
      w1/w2/imm: [1, L] packed parent tape.
      lengths: [T] — 0 disables a tile entirely (culled).
      codes: [T, LW] int32, 16 two-bit codes per word, op-major.
      vars_: [T, V, S0, 128] f32 input planes.
    Returns:
      [T, O, S0, 128] f32 outputs.
    """
    T = vars_.shape[0]
    lcap = w1.shape[1]
    lw = codes.shape[1]
    fm = FloatMode(kernel_namespace(jnp), choice_dtype=jnp.int32)

    def kernel(w1_ref, w2_ref, imm_ref, len_ref, codes_ref, vars_ref, out_ref, regs):
        n = len_ref[0, 0, 0]

        def step(j, _):
            cword = codes_ref[0, 0, j // 16]
            code = (cword >> ((j % 16) * 2)) & 3

            @pl.when(code > 0)
            def _():
                op, out, a, b, aux = _decode(w1_ref[0, 0, j], w2_ref[0, 0, j])
                # code 2/3: execute as COPY from the chosen operand
                a = jnp.where(code == 3, b, a)
                op = jnp.where(code > 1, TapeOp.COPY, op)
                immv = imm_ref[0, 0, j]
                imm_plane = jnp.full((s0, 128), immv, jnp.float32)
                va = jnp.where(a == IMM12, imm_plane, regs[jnp.minimum(a, nf - 1)])
                vb = jnp.where(b == IMM12, imm_plane, regs[jnp.minimum(b, nf - 1)])
                aux_in = jnp.minimum(aux, n_inputs - 1)

                branches = _build_branches(
                    tuple(range(_N_OPS)), fm, va, vb,
                    lambda: vars_ref[0, aux_in],
                )
                res = lax.switch(op, branches)

                @pl.when(op == TapeOp.OUTPUT)
                def _():
                    out_ref[0, jnp.minimum(aux, n_outputs - 1)] = va

                regs[out] = res

            return 0

        lax.fori_loop(0, jnp.minimum(n, lcap), step, 0)

    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, lcap), lambda i: (0, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, lcap), lambda i: (0, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, lcap), lambda i: (0, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, lw), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_inputs, s0, 128), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n_outputs, s0, 128), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, n_outputs, s0, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nf, s0, 128), jnp.float32)],
        interpret=interpret,
    )(
        jnp.asarray(w1).reshape(1, 1, lcap),
        jnp.asarray(w2).reshape(1, 1, lcap),
        jnp.asarray(imm).reshape(1, 1, lcap),
        jnp.asarray(lengths).reshape(T, 1, 1),
        jnp.asarray(codes).reshape(T, 1, lw),
        vars_,
    )


# ======================================================================
# interval mode (with packed 2-bit choice capture)


@functools.partial(
    jax.jit,
    static_argnames=(
        "nf", "n_inputs", "n_outputs", "s0", "c_words", "interpret",
        "op_order", "n_ops",
    ),
)
def _interp_interval_impl(
    w1, w2, imm, lengths, var_lo, var_hi, *, nf: int, n_inputs: int,
    n_outputs: int, s0: int, c_words: int, interpret: bool = False,
    op_order: tuple | None = None, n_ops: int = _N_OPS,
):
    """Evaluates packed tapes in interval mode, capturing choices.

    Args:
      var_lo/var_hi: [T, V, S0, 128] f32 interval bounds per input.
      c_words: choice words per lane (16 two-bit choices per int32).
        Choice ops carry their choice index in `aux` (pack_rows
        assigns the indices unconditionally); indices >= 16*c_words
        wrap into the last word OR-wise — over-approximate like the
        wgpu lossy choice stack, never wrong.
    Returns:
      (out_lo [T,O,S0,128], out_hi [T,O,S0,128], choices [T,CW,S0,128] i32)
    """
    T, lcap = w1.shape
    im = IntervalMode(kernel_namespace(jnp), choice_dtype=jnp.int32)
    canonical_at_pos, pos_of, choice_mask_p = _order_info(op_order, n_ops)
    out_pos = pos_of[int(TapeOp.OUTPUT)]

    def kernel(
        w1_ref, w2_ref, imm_ref, len_ref, lo_ref, hi_ref,
        olo_ref, ohi_ref, ch_ref, rlo, rhi,
    ):
        n = len_ref[0, 0, 0]
        ch_ref[0] = jnp.zeros((c_words, s0, 128), jnp.int32)

        def step(j, _):
            op, out, a, b, aux = _decode(w1_ref[0, 0, j], w2_ref[0, 0, j])
            immv = imm_ref[0, 0, j]
            imm_plane = jnp.full((s0, 128), immv, jnp.float32)
            a_c = jnp.minimum(a, nf - 1)
            b_c = jnp.minimum(b, nf - 1)
            is_imm_a = a == IMM12
            is_imm_b = b == IMM12
            alo = jnp.where(is_imm_a, imm_plane, rlo[a_c])
            ahi = jnp.where(is_imm_a, imm_plane, rhi[a_c])
            blo = jnp.where(is_imm_b, imm_plane, rlo[b_c])
            bhi = jnp.where(is_imm_b, imm_plane, rhi[b_c])
            va = (alo, ahi)
            vb = (blo, bhi)
            aux_in = jnp.minimum(aux, n_inputs - 1)
            zero_code = jnp.zeros((s0, 128), jnp.int32)

            def mk_choice(cop):
                def f():
                    (lo, hi), code = im.choice_binary(cop, va, vb)
                    return lo, hi, code
                return f

            branches = []
            for canon in canonical_at_pos:
                canon = TapeOp(canon)
                if canon == TapeOp.INPUT:
                    branches.append(lambda: (
                        lo_ref[0, aux_in], hi_ref[0, aux_in], zero_code,
                    ))
                elif canon in _UNARY_OPS:
                    branches.append(
                        lambda canon=canon: (*im.unary(canon, va), zero_code)
                    )
                elif canon in _PLAIN_BINARY_OPS:
                    branches.append(
                        lambda canon=canon: (
                            *im.binary(canon, va, vb), zero_code,
                        )
                    )
                elif canon in _CHOICE_OPS:
                    branches.append(mk_choice(canon))
                else:
                    branches.append(lambda: (alo, ahi, zero_code))
            lo, hi, code = lax.switch(op, branches)

            @pl.when(op == out_pos)
            def _():
                o = jnp.minimum(aux, n_outputs - 1)
                olo_ref[0, o] = alo
                ohi_ref[0, o] = ahi

            is_choice = ((choice_mask_p >> op) & 1) == 1

            @pl.when(is_choice)
            def _():
                word = jnp.minimum(aux // 16, c_words - 1)
                shift = (aux % 16) * 2
                ch_ref[0, word] = ch_ref[0, word] | (code << shift)

            rlo[out] = lo
            rhi[out] = hi
            return 0

        lax.fori_loop(0, jnp.minimum(n, lcap), step, 0)

    out_shape = (
        jax.ShapeDtypeStruct((T, n_outputs, s0, 128), jnp.float32),
        jax.ShapeDtypeStruct((T, n_outputs, s0, 128), jnp.float32),
        jax.ShapeDtypeStruct((T, c_words, s0, 128), jnp.int32),
    )
    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=_tape_specs(lcap)
        + [
            pl.BlockSpec((1, n_inputs, s0, 128), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, n_inputs, s0, 128), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, n_outputs, s0, 128), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, n_outputs, s0, 128), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, c_words, s0, 128), lambda i: (i, 0, 0, 0)),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((nf, s0, 128), jnp.float32),
            pltpu.VMEM((nf, s0, 128), jnp.float32),
        ],
        interpret=interpret,
    )(*_prep_tape_args(w1, w2, imm, lengths), var_lo, var_hi)


@functools.lru_cache(maxsize=None)
def _interval_nondiff_fn(nf, n_inputs, n_outputs, s0, c_words, interpret,
                         op_order, n_ops):
    kw = dict(
        nf=nf, n_inputs=n_inputs, n_outputs=n_outputs, s0=s0,
        c_words=c_words, interpret=interpret, op_order=op_order,
        n_ops=n_ops,
    )

    @jax.custom_jvp
    def f(w1, w2, imm, lengths, var_lo, var_hi):
        return _interp_interval_impl(w1, w2, imm, lengths, var_lo, var_hi,
                                     **kw)

    @f.defjvp
    def f_jvp(primals, tangents):
        olo, ohi, ch = f(*primals)
        return (olo, ohi, ch), (
            jnp.zeros_like(olo),
            jnp.zeros_like(ohi),
            np.zeros(ch.shape, dtype=jax.dtypes.float0),
        )

    return f


def interp_interval(
    w1, w2, imm, lengths, var_lo, var_hi, *, nf: int, n_inputs: int,
    n_outputs: int, s0: int, c_words: int, interpret: bool = False,
    op_order: tuple | None = None, n_ops: int = _N_OPS,
):
    """Interval evaluation with choice capture (see
    `_interp_interval_impl` for the contract).

    Defines a ZERO JVP: in every pipeline the interval outputs feed
    only region proofs and tape specialization — control flow that is
    piecewise constant in the shape parameters (the same stop-gradient
    contract as the reference's fill pixels, which carry no distance).
    That makes the whole interpreter render pipeline `jax.jvp`-able:
    tangents flow through the leaf float kernel and die at the proofs.
    Do NOT use interval mode to compute derivative bounds via autodiff;
    for derivative intervals evaluate a `Context.deriv` tape instead.

    VMEM: two register files in scratch; like `interp_grad`, lane
    blocks past the scoped-vmem budget transparently split along s0
    (choices chunk consistently — packing is per-lane)."""
    nf_s0_limit = (12 << 20) // (2 * 4 * 128 * max(nf, 1))
    s0_max = max(8, (nf_s0_limit // 8) * 8)
    if s0 > s0_max:
        los, his, chs = [], [], []
        for off in range(0, s0, s0_max):
            w = min(s0_max, s0 - off)
            lo, hi, ch = interp_interval(
                w1, w2, imm, lengths,
                var_lo[..., off:off + w, :], var_hi[..., off:off + w, :],
                nf=nf, n_inputs=n_inputs, n_outputs=n_outputs, s0=w,
                c_words=c_words, interpret=interpret,
                op_order=op_order, n_ops=n_ops,
            )
            los.append(lo)
            his.append(hi)
            chs.append(ch)
        return (
            jnp.concatenate(los, axis=2),
            jnp.concatenate(his, axis=2),
            jnp.concatenate(chs, axis=2),
        )
    return _interval_nondiff_fn(
        nf, n_inputs, n_outputs, s0, c_words, interpret, op_order, n_ops
    )(w1, w2, imm, lengths, var_lo, var_hi)


# ======================================================================
# grad mode (forward duals: v, dx, dy, dz)


@functools.partial(
    jax.jit,
    static_argnames=(
        "nf", "n_inputs", "n_outputs", "s0", "interpret", "op_order",
        "n_ops",
    ),
)
def interp_grad(
    w1, w2, imm, lengths, vars_, *, nf: int, n_inputs: int, n_outputs: int,
    s0: int, interpret: bool = False, op_order: tuple | None = None,
    n_ops: int = _N_OPS,
):
    """Evaluates packed tapes with forward-mode duals.

    Args:
      vars_: [T, V, 4, S0, 128] f32 dual planes (v, dx, dy, dz).
    Returns:
      [T, O, 4, S0, 128] f32 dual outputs.

    VMEM budget: the kernel holds FOUR register files of
    [nf, s0, 128] f32 in scratch (~nf*s0*2 KB) against Mosaic's
    16 MB scoped-vmem limit (interpret mode does not enforce it; the
    real-TPU parity sweep caught the overflow, BUGREPORT.md). Lanes
    are independent, so when nf * s0 would blow the budget this
    wrapper transparently splits the s0 axis into fitting chunks and
    concatenates — grads work at any leaf tile size.
    """
    nf_s0_limit = (12 << 20) // (4 * 4 * 128 * max(nf, 1))  # ~12 MB
    s0_max = max(8, (nf_s0_limit // 8) * 8)
    if s0 > s0_max:
        outs = []
        for off in range(0, s0, s0_max):
            w = min(s0_max, s0 - off)
            outs.append(interp_grad(
                w1, w2, imm, lengths, vars_[..., off:off + w, :],
                nf=nf, n_inputs=n_inputs, n_outputs=n_outputs, s0=w,
                interpret=interpret, op_order=op_order, n_ops=n_ops,
            ))
        return jnp.concatenate(outs, axis=3)
    T, lcap = w1.shape
    gm = GradMode(kernel_namespace(jnp), choice_dtype=jnp.int32)
    canonical_at_pos, pos_of, _ = _order_info(op_order, n_ops)
    out_pos = pos_of[int(TapeOp.OUTPUT)]

    def kernel(w1_ref, w2_ref, imm_ref, len_ref, vars_ref, out_ref, *regs):
        n = len_ref[0, 0, 0]

        def step(j, _):
            op, out, a, b, aux = _decode(w1_ref[0, 0, j], w2_ref[0, 0, j])
            immv = imm_ref[0, 0, j]
            imm_plane = jnp.full((s0, 128), immv, jnp.float32)
            zero = jnp.zeros((s0, 128), jnp.float32)
            a_c = jnp.minimum(a, nf - 1)
            b_c = jnp.minimum(b, nf - 1)
            is_imm_a = a == IMM12
            is_imm_b = b == IMM12
            va = tuple(
                jnp.where(is_imm_a, imm_plane if k == 0 else zero, regs[k][a_c])
                for k in range(4)
            )
            vb = tuple(
                jnp.where(is_imm_b, imm_plane if k == 0 else zero, regs[k][b_c])
                for k in range(4)
            )
            aux_in = jnp.minimum(aux, n_inputs - 1)

            branches = _build_branches(
                canonical_at_pos, gm, va, vb,
                lambda: tuple(vars_ref[0, aux_in, k] for k in range(4)),
            )
            res = lax.switch(op, branches)

            @pl.when(op == out_pos)
            def _():
                o = jnp.minimum(aux, n_outputs - 1)
                for k in range(4):
                    out_ref[0, o, k] = va[k]

            for k in range(4):
                regs[k][out] = res[k]
            return 0

        lax.fori_loop(0, jnp.minimum(n, lcap), step, 0)

    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=_tape_specs(lcap)
        + [pl.BlockSpec((1, n_inputs, 4, s0, 128), lambda i: (i, 0, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, n_outputs, 4, s0, 128), lambda i: (i, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, n_outputs, 4, s0, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nf, s0, 128), jnp.float32) for _ in range(4)],
        interpret=interpret,
    )(*_prep_tape_args(w1, w2, imm, lengths), vars_)


def default_interpret() -> bool:
    """True when no TPU is available (tests on the CPU mesh).

    Any non-TPU backend (cpu, gpu, ...) must take interpret mode: the
    kernels use pltpu memory spaces and only lower through Mosaic."""
    return jax.devices()[0].platform != "tpu" and (
        jax.devices()[0].platform != "axon"
    )


def unpack_choices(packed: np.ndarray, n_choices: int) -> np.ndarray:
    """Unpacks [..., CW, S0, 128] int32 words into [..., C, S0, 128] u8."""
    packed = np.asarray(packed)
    cw = packed.shape[-3]
    idx = np.arange(n_choices)
    words = packed[..., np.minimum(idx // 16, cw - 1), :, :]
    shifts = (idx % 16) * 2
    return ((words >> shifts[..., None, None]) & 3).astype(np.uint8)
