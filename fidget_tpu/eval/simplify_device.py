"""Batched on-device tape simplification.

The device analog of `compiler/simplify.py`: given one parent tape and
a batch of per-tile choice traces, produce per-tile specialized tapes —
entirely on device, with no per-tile host work. This is the TPU
equivalent of the wgpu in-shader simplifier
(fidget-wgpu/src/voxel/shaders/tape_simplify.wgsl:56-179), restructured
for SIMD: instead of one thread compacting one tile's tape, a
`lax.scan` walks the (shared) parent tape once in reverse while
carrying a [tiles, registers] liveness matrix, emitting a per-(tile,
op) action code; reconstruction and compaction are then plain
vectorized gathers/cumsums.

Action codes: 0 = drop, 1 = keep as-is, 2 = rewrite to COPY(out<-a),
3 = rewrite to COPY(out<-b). Self-copies are elided (code 0) while the
destination register stays live, exactly like the host version.

Because a child tape is always a subsequence of its parent (register
assignments are preserved), the child arena capacity equals the parent
length and overflow cannot occur.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..compiler.pack import IMM12, PackedTapes, _op_rank, pack_rows
from ..compiler.tape import (
    BINARY_MASK,
    BINARY_TAPE_OPS,
    CHOICE_MASK,
    Tape,
    TapeOp,
    UNARY_TAPE_OPS,
)

_CHOICE_OP_VALUES = (int(TapeOp.MIN), int(TapeOp.MAX), int(TapeOp.AND), int(TapeOp.OR))


def _decode_static(w1: np.ndarray, w2: np.ndarray):
    op = w1 & 127
    out = (w1 >> 7) & 0xFFF
    a = (w1 >> 19) & 0xFFF
    b = w2 & 0xFFF
    aux = w2 >> 12
    return op, out, a, b, aux


def _order_masks(op_order):
    """(output_code, input_code, choice_mask, binary_mask) for a
    (possibly renumbered) opcode ordering."""
    if op_order is None:
        order = list(range(64))
    else:
        order = list(op_order)
    pos_of = {canon: pos for pos, canon in enumerate(order)}
    cmask = 0
    for o in CHOICE_MASK_OPS:
        cmask |= 1 << pos_of[int(o)]
    bmask = 0
    for o in BINARY_TAPE_OPS:
        bmask |= 1 << pos_of[int(o)]
    return (
        pos_of[int(TapeOp.OUTPUT)], pos_of[int(TapeOp.INPUT)], cmask, bmask,
    )


CHOICE_MASK_OPS = (TapeOp.MIN, TapeOp.MAX, TapeOp.AND, TapeOp.OR)


def _liveness_codes(
    w1s, w2s, lengths, packed_choices, *, nf: int, L: int,
    shared_tape: bool, interpret: bool = False,
    op_order: tuple | None = None,
):
    """Reverse-liveness Pallas kernel shared by the static- and
    dynamic-tape simplifiers: walks each tape backwards, carrying a
    per-lane [nf] liveness plane, and emits packed 2-bit action codes
    per (lane, op). `shared_tape=True` maps every grid instance to the
    single tape block (DeviceSimplifier); otherwise instance i uses
    tape row i (DynamicSimplifier).

    w1s/w2s: [Tt, 1, L] i32; lengths: [Tt, 1, 1]; packed_choices:
    [B, CW, S0, 128] i32. Returns codes [B, LW, S0, 128] i32.
    """
    B = packed_choices.shape[0]
    cw = packed_choices.shape[1]
    s0 = packed_choices.shape[2]
    lw = -(-L // 16)
    tape_ix = (lambda i: (0, 0, 0)) if shared_tape else (lambda i: (i, 0, 0))
    out_code, in_code, choice_mask, binary_mask = _order_masks(op_order)

    def kernel(w1_ref, w2_ref, len_ref, ch_ref, codes_ref, live):
        n = len_ref[0, 0, 0]
        live[...] = jnp.zeros((nf, s0, 128), jnp.int32)
        codes_ref[0] = jnp.zeros((lw, s0, 128), jnp.int32)

        def step(k, _):
            j = n - 1 - k
            wa = w1_ref[0, 0, j]
            wb = w2_ref[0, 0, j]
            op = wa & 127
            out = (wa >> 7) & 0xFFF
            a = (wa >> 19) & 0xFFF
            b = wb & 0xFFF
            aux = wb >> 12
            is_output = op == out_code
            is_choice = ((choice_mask >> op) & 1) == 1
            a_is_reg = (op != in_code) & (a != IMM12)
            b_is_reg = (((binary_mask >> op) & 1) == 1) & (b != IMM12)
            ones = jnp.ones((s0, 128), jnp.int32)
            executed = jnp.where(is_output, ones, live[out])
            cword = ch_ref[0, jnp.minimum(aux // 16, cw - 1)]
            c = (cword >> ((aux % 16) * 2)) & 3
            left = jnp.where(is_choice, (c == 1).astype(jnp.int32), 0)
            right = jnp.where(is_choice, (c == 2).astype(jnp.int32), 0)
            both = jnp.where(
                is_choice, ((c == 3) | (c == 0)).astype(jnp.int32), 1
            )
            elide = executed & (
                jnp.where(a == out, left, 0) | jnp.where(b == out, right, 0)
            )
            emit = executed & (1 - elide)
            code = emit * jnp.where(both == 1, 1, jnp.where(left == 1, 2, 3))
            w_idx = j // 16
            codes_ref[0, w_idx] = codes_ref[0, w_idx] | (
                code << ((j % 16) * 2)
            )
            use_a = jnp.where(a_is_reg, emit & (both | left), 0)
            use_b = jnp.where(b_is_reg, emit & (both | right), 0)
            live[out] = live[out] & (1 - emit)
            # immediate operands carry the IMM12 (4095) sentinel in
            # a/b — clamp before indexing the [nf] scratch (use_* is 0
            # then, so the clamped row ORs with 0: a no-op). Unclamped,
            # this was an out-of-bounds VMEM write on every immediate
            # (interpret mode clamps silently; TPU Mosaic does not).
            live[jnp.minimum(a, nf - 1)] = (
                live[jnp.minimum(a, nf - 1)] | use_a
            )
            live[jnp.minimum(b, nf - 1)] = (
                live[jnp.minimum(b, nf - 1)] | use_b
            )
            return 0

        lax.fori_loop(0, n, step, 0)

    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, L), tape_ix, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, L), tape_ix, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), tape_ix, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, cw, s0, 128), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, lw, s0, 128), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, lw, s0, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((nf, s0, 128), jnp.int32)],
        interpret=interpret,
    )(w1s, w2s, lengths, packed_choices)


class DeviceSimplifier:
    """Compiled simplifier for one parent tape.

    Usage:
      ds = DeviceSimplifier(tape)
      w1, w2, imm, lengths, n_choices = ds(choices)   # choices: [T, C] u8
    """

    def __init__(self, tape: Tape, op_order: tuple | None = None):
        # flags come from the CANONICAL encoding; the emitted child
        # arenas (w1 / copy rewrites) use the renumbered one, so they
        # feed kernels built with the same op_order
        w1c, w2, imm = pack_rows(tape)
        if op_order is None:
            w1 = w1c
        else:
            # renumbering touches only the low-7-bit op field, so the
            # renumbered arena derives from the canonical pack without
            # a second pack_rows pass
            w1 = (
                (w1c & ~np.int32(127))
                | _op_rank(op_order)[w1c & 127].astype(np.int32)
            ).astype(np.int32)
        self.parent = tape
        self.op_order = op_order
        self.nf = tape.reg_count + tape.mem_count
        self.n_choices = tape.choice_count
        self.L = len(tape)
        op, out, a, b, aux = _decode_static(w1c, w2)
        is_choice = np.isin(op, _CHOICE_OP_VALUES)
        # operand-use flags (static): which packed fields are registers
        unary_like = np.isin(
            op, [int(TapeOp.COPY)] + [int(u) for u in UNARY_TAPE_OPS]
        )
        binary_like = np.isin(op, [int(b) for b in BINARY_TAPE_OPS])
        is_output = op == int(TapeOp.OUTPUT)
        copy_code = int(TapeOp.COPY)
        if op_order is not None:
            copy_code = list(op_order).index(int(TapeOp.COPY))
        self._st = dict(
            w1=w1.astype(np.int32),
            w2=w2.astype(np.int32),
            imm=imm,
            op=op.astype(np.int32),
            out=out.astype(np.int32),
            a=a.astype(np.int32),
            b=b.astype(np.int32),
            cidx=np.where(is_choice, aux, 0).astype(np.int32),
            is_choice=is_choice,
            is_output=is_output,
            a_is_reg=((unary_like | binary_like | is_output) & (a != IMM12)),
            b_is_reg=(binary_like & ~unary_like & (b != IMM12)),
            elide_l=(a == out),
            elide_r=(b == out),
            # pre-encoded COPY rewrites (renumbered encoding)
            w1_copy_a=(copy_code | (out << 7) | (a << 19)).astype(np.int32),
            w1_copy_b=(copy_code | (out << 7) | (b << 19)).astype(np.int32),
        )

    # ------------------------------------------------------------------
    # liveness -> per-(tile, op) action codes

    @functools.partial(jax.jit, static_argnums=0)
    def _codes_scan(self, choices: jax.Array):
        """Reference path: lax.scan over the tape (CPU-friendly).

        choices: [T, C] int codes. Returns codes [T, L] uint8.
        """
        st = {k: jnp.asarray(v) for k, v in self._st.items()}
        T = choices.shape[0]
        nf = self.nf
        choices = choices.astype(jnp.int32)
        if self.n_choices == 0:
            choices = jnp.zeros((T, 1), jnp.int32)
        iota_nf = jnp.arange(nf, dtype=jnp.int32)

        def step(live, xs):
            (op, out, a, b, cidx, is_choice, is_output,
             a_is_reg, b_is_reg, elide_l, elide_r) = xs
            executed = jnp.where(is_output, True, live[:, out])
            c = choices[:, cidx]
            left = is_choice & (c == 1)
            right = is_choice & (c == 2)
            both = ~is_choice | (c == 3) | (c == 0)
            elide = executed & ((left & elide_l) | (right & elide_r))
            emit = executed & ~elide
            code = jnp.where(
                ~emit, 0, jnp.where(both, 1, jnp.where(left, 2, 3))
            ).astype(jnp.uint8)
            use_a = emit & a_is_reg & (both | left)
            use_b = emit & b_is_reg & (both | right)
            onehot_out = iota_nf == out
            onehot_a = iota_nf == a
            onehot_b = iota_nf == b
            live = live & ~(emit[:, None] & onehot_out[None, :])
            live = live | (use_a[:, None] & onehot_a[None, :])
            live = live | (use_b[:, None] & onehot_b[None, :])
            return live, code

        xs = (
            st["op"], st["out"], st["a"], st["b"], st["cidx"],
            st["is_choice"], st["is_output"], st["a_is_reg"], st["b_is_reg"],
            st["elide_l"], st["elide_r"],
        )
        live0 = jnp.zeros((T, nf), dtype=bool)
        _, codes = jax.lax.scan(step, live0, xs, reverse=True)
        return codes.T  # [T, L]

    @functools.partial(
        jax.jit, static_argnums=0, static_argnames=("n_tiles", "s0", "interpret")
    )
    def _codes_pallas(
        self, packed_choices: jax.Array, *, n_tiles: int, s0: int,
        interpret: bool = False,
    ):
        """Fast path: shared-tape liveness kernel, lanes = tiles.

        packed_choices: [B, CW, S0, 128] int32, 16 two-bit choice codes
        per word, exactly as produced by `interp_interval` (B lane
        blocks of S0*128 tiles each). Returns packed per-tile code words
        [n_tiles, LW]."""
        L = self.L
        lw = -(-L // 16)
        w1, w2, imm = pack_rows(self.parent, self.op_order)
        codes = _liveness_codes(
            jnp.asarray(w1).reshape(1, 1, L),
            jnp.asarray(w2).reshape(1, 1, L),
            jnp.full((1, 1, 1), L, jnp.int32),
            packed_choices,
            nf=self.nf, L=L, shared_tape=True, interpret=interpret,
            op_order=self.op_order,
        )
        # word-major lanes -> per-tile packed rows [n_tiles, LW]
        B = packed_choices.shape[0]
        lanes = codes.reshape(B, lw, s0 * 128)
        return jnp.moveaxis(lanes, 1, 2).reshape(B * s0 * 128, lw)[:n_tiles]

    @staticmethod
    def unpack_codes(per_tile: jax.Array, L: int) -> jax.Array:
        """[T, LW] packed words -> [T, L] uint8 action codes."""
        idx = jnp.arange(L)
        words = per_tile[:, idx // 16]
        return ((words >> ((idx % 16) * 2)[None, :]) & 3).astype(jnp.uint8)

    # ------------------------------------------------------------------
    # code reconstruction + compaction (shared by both paths)

    @functools.partial(jax.jit, static_argnums=0)
    def _reconstruct(self, codes: jax.Array):
        """codes: [T, L] uint8 action codes -> packed child arenas."""
        st = {k: jnp.asarray(v) for k, v in self._st.items()}
        T = codes.shape[0]
        L = self.L
        keep = codes > 0
        w1_new = jnp.where(
            codes == 1,
            st["w1"][None, :],
            jnp.where(codes == 2, st["w1_copy_a"][None, :], st["w1_copy_b"][None, :]),
        )
        w2_new = jnp.where(codes == 1, st["w2"][None, :], 0)
        # re-index surviving choice ops (aux field of w2)
        kept_choice = keep & (codes == 1) & st["is_choice"][None, :]
        new_cidx = jnp.cumsum(kept_choice, axis=1) - 1
        w2_new = jnp.where(
            kept_choice, st["b"][None, :] | (new_cidx << 12), w2_new
        )
        n_choices_new = kept_choice.sum(axis=1).astype(jnp.int32)

        lengths = keep.sum(axis=1).astype(jnp.int32)
        # Compaction = stable partition: kept rows first, original order.
        # A stable multi-operand sort is ~100x faster than scatter on TPU.
        keys = (~keep).astype(jnp.int32)
        imm_b = jnp.broadcast_to(st["imm"][None, :], (T, L))
        _, w1_out, w2_out, imm_out = lax.sort(
            (keys, w1_new, w2_new, imm_b), dimension=1, is_stable=True,
            num_keys=1,
        )
        # zero the tail beyond each tape's length (tidier arenas)
        tail = jnp.arange(L)[None, :] >= lengths[:, None]
        w1_out = jnp.where(tail, 0, w1_out)
        w2_out = jnp.where(tail, 0, w2_out)
        imm_out = jnp.where(tail, 0.0, imm_out)
        return w1_out, w2_out, imm_out, lengths, n_choices_new

    # ------------------------------------------------------------------
    # public entry points

    def __call__(self, choices: jax.Array):
        """choices: [T, C] uint8 codes -> packed child arenas (scan path)."""
        return self._reconstruct(self._codes_scan(choices))

    def codes_per_tile(
        self, packed_choices: jax.Array, *, n_tiles: int,
        interpret: bool = False,
    ):
        """Packed-choice fast path (Pallas liveness kernel).

        packed_choices: [B, CW, S0, 128] int32 straight from
        `interp_interval`; tiles are lanes in row-major order. Returns
        [n_tiles, LW] packed action-code words, ready for
        `interp_float_coded` (no tape materialization at all).
        """
        s0 = packed_choices.shape[2]
        return self._codes_pallas(
            packed_choices, n_tiles=n_tiles, s0=s0, interpret=interpret
        )

    def simplify_packed(
        self, packed_choices: jax.Array, *, n_tiles: int,
        interpret: bool = False,
    ):
        """Like `codes_per_tile` but materializes compacted child tapes
        (needed when children feed further interval levels)."""
        per_tile = self.codes_per_tile(
            packed_choices, n_tiles=n_tiles, interpret=interpret
        )
        return self._reconstruct(self.unpack_codes(per_tile, self.L))


# ======================================================================
# dynamic-tape simplification (second and later levels)


class DynamicSimplifier:
    """Simplifies *per-tile* packed tapes (e.g. DeviceSimplifier
    outputs) against per-lane choice traces, producing one child tape
    per (tile, lane).

    This is the piece the wgpu pipeline runs at every level
    (interval_tiles.wgsl -> tape_simplify.wgsl): tapes at level k+1 are
    derived from the *dynamic* tapes of level k, not from the static
    root tape. The liveness kernel is the same as DeviceSimplifier's,
    with the tape block indexed per grid instance; reconstruction is
    fully vectorized over (tile, row).
    """

    @staticmethod
    @functools.partial(
        jax.jit, static_argnames=("nf", "interpret", "op_order")
    )
    def codes(w1s, w2s, lengths, packed_choices, *, nf: int,
              interpret: bool = False, op_order: tuple | None = None):
        """w1s/w2s: [T, L] i32 per-tile tapes; lengths: [T];
        packed_choices: [T, CW, S0, 128] from interp_interval.
        Returns per-lane packed action-code words [T, S0*128, LW]."""
        T, L = w1s.shape
        s0 = packed_choices.shape[2]
        lw = -(-L // 16)
        codes = _liveness_codes(
            w1s.reshape(T, 1, L).astype(jnp.int32),
            w2s.reshape(T, 1, L).astype(jnp.int32),
            lengths.reshape(T, 1, 1).astype(jnp.int32),
            packed_choices,
            nf=nf, L=L, shared_tape=False, interpret=interpret,
            op_order=op_order,
        )
        # word-major lanes -> per-lane packed rows [T, S0*128, LW]
        return jnp.moveaxis(codes.reshape(T, lw, s0 * 128), 1, 2)

    @staticmethod
    @functools.partial(jax.jit, static_argnames=("op_order",))
    def reconstruct(w1p, w2p, immp, codes, *, op_order: tuple | None = None):
        """Builds child arenas from parent rows + per-child action codes.

        w1p/w2p/immp: [TC, L] parent tape rows gathered per child;
        codes: [TC, L] uint8 action codes. Returns
        (w1, w2, imm, lengths, n_choices) with the same row layout and
        re-indexed choice aux fields as DeviceSimplifier._reconstruct."""
        TC, L = w1p.shape
        w1p = w1p.astype(jnp.int32)
        w2p = w2p.astype(jnp.int32)
        op = w1p & 127
        out = (w1p >> 7) & 0xFFF
        a = (w1p >> 19) & 0xFFF
        b = w2p & 0xFFF
        keep = codes > 0
        copy_code = int(TapeOp.COPY)
        choice_mask = CHOICE_MASK
        if op_order is not None:
            copy_code = list(op_order).index(int(TapeOp.COPY))
            choice_mask = _order_masks(op_order)[2]
        copy_a = copy_code | (out << 7) | (a << 19)
        copy_b = copy_code | (out << 7) | (b << 19)
        w1_new = jnp.where(
            codes == 1, w1p, jnp.where(codes == 2, copy_a, copy_b)
        )
        w2_new = jnp.where(codes == 1, w2p, 0)
        is_choice = ((choice_mask >> op) & 1) == 1
        kept_choice = keep & (codes == 1) & is_choice
        new_cidx = jnp.cumsum(kept_choice, axis=1) - 1
        w2_new = jnp.where(kept_choice, b | (new_cidx << 12), w2_new)
        n_choices = kept_choice.sum(axis=1).astype(jnp.int32)
        lengths = keep.sum(axis=1).astype(jnp.int32)
        keys = (~keep).astype(jnp.int32)
        _, w1_out, w2_out, imm_out = lax.sort(
            (keys, w1_new, w2_new, immp), dimension=1, is_stable=True,
            num_keys=1,
        )
        tail = jnp.arange(L)[None, :] >= lengths[:, None]
        w1_out = jnp.where(tail, 0, w1_out)
        w2_out = jnp.where(tail, 0, w2_out)
        imm_out = jnp.where(tail, 0.0, imm_out)
        return w1_out, w2_out, imm_out, lengths, n_choices
