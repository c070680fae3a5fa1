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

from ..compiler.pack import IMM12, PackedTapes, pack_rows
from ..compiler.tape import Tape, TapeOp

_CHOICE_OP_VALUES = (int(TapeOp.MIN), int(TapeOp.MAX), int(TapeOp.AND), int(TapeOp.OR))


def _decode_static(w1: np.ndarray, w2: np.ndarray):
    op = w1 & 127
    out = (w1 >> 7) & 0xFFF
    a = (w1 >> 19) & 0xFFF
    b = w2 & 0xFFF
    aux = w2 >> 12
    return op, out, a, b, aux


class DeviceSimplifier:
    """Compiled simplifier for one parent tape.

    Usage:
      ds = DeviceSimplifier(tape)
      w1, w2, imm, lengths, n_choices = ds(choices)   # choices: [T, C] u8
    """

    def __init__(self, tape: Tape):
        w1, w2, imm = pack_rows(tape)
        self.parent = tape
        self.nf = tape.reg_count + tape.mem_count
        self.n_choices = tape.choice_count
        self.L = len(tape)
        op, out, a, b, aux = _decode_static(w1, w2)
        is_choice = np.isin(op, _CHOICE_OP_VALUES)
        # operand-use flags (static): which packed fields are registers
        unary_like = np.isin(
            op,
            [int(TapeOp.COPY)]
            + [int(u) for u in range(int(TapeOp.NEG), int(TapeOp.LN) + 1)],
        )
        binary_like = op >= int(TapeOp.ADD)
        is_output = op == int(TapeOp.OUTPUT)
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
            # pre-encoded COPY rewrites
            w1_copy_a=(int(TapeOp.COPY) | (out << 7) | (a << 19)).astype(np.int32),
            w1_copy_b=(int(TapeOp.COPY) | (out << 7) | (b << 19)).astype(np.int32),
        )

    @functools.partial(jax.jit, static_argnums=0)
    def __call__(self, choices: jax.Array):
        """choices: [T, C] uint8 (2-bit codes) -> packed child arenas."""
        st = {k: jnp.asarray(v) for k, v in self._st.items()}
        T = choices.shape[0]
        nf = self.nf
        L = self.L
        # Row-major layouts for the scan: liveness is [NF, T] and the
        # choice matrix [C, T], so every per-step dynamic index is a
        # contiguous row slice (column gathers on [T, NF] were ~60x
        # slower on TPU).
        choices = choices.T.astype(jnp.int32)
        if self.n_choices == 0:
            # no choice ops: the gather below still needs one row
            choices = jnp.zeros((1, T), jnp.int32)
        iota_nf = jnp.arange(nf, dtype=jnp.int32)

        def step(live, xs):
            (op, out, a, b, cidx, is_choice, is_output,
             a_is_reg, b_is_reg, elide_l, elide_r) = xs
            executed = jnp.where(is_output, True, live[out])
            c = choices[cidx]
            left = is_choice & (c == 1)
            right = is_choice & (c == 2)
            both = ~is_choice | (c == 3) | (c == 0)
            elide = executed & ((left & elide_l) | (right & elide_r))
            emit = executed & ~elide
            code = jnp.where(
                ~emit,
                0,
                jnp.where(both, 1, jnp.where(left, 2, 3)),
            ).astype(jnp.uint8)
            use_a = emit & a_is_reg & (both | left)
            use_b = emit & b_is_reg & (both | right)
            onehot_out = iota_nf == out
            onehot_a = iota_nf == a
            onehot_b = iota_nf == b
            live = live & ~(onehot_out[:, None] & emit[None, :])
            live = live | (onehot_a[:, None] & use_a[None, :])
            live = live | (onehot_b[:, None] & use_b[None, :])
            return live, code

        xs = (
            st["op"], st["out"], st["a"], st["b"], st["cidx"],
            st["is_choice"], st["is_output"], st["a_is_reg"], st["b_is_reg"],
            st["elide_l"], st["elide_r"],
        )
        live0 = jnp.zeros((nf, T), dtype=bool)
        _, codes = jax.lax.scan(step, live0, xs, reverse=True)
        codes = codes.T  # [T, L]

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

        # compact each row
        pos = jnp.cumsum(keep, axis=1) - 1
        lengths = (pos[:, -1] + 1).astype(jnp.int32)
        pos = jnp.where(keep, pos, L)  # park dropped rows out of range
        t_idx = jnp.broadcast_to(jnp.arange(T)[:, None], (T, L))
        w1_out = jnp.zeros((T, L), jnp.int32).at[t_idx, pos].set(
            w1_new, mode="drop"
        )
        w2_out = jnp.zeros((T, L), jnp.int32).at[t_idx, pos].set(
            w2_new, mode="drop"
        )
        imm_out = jnp.zeros((T, L), jnp.float32).at[t_idx, pos].set(
            jnp.broadcast_to(st["imm"][None, :], (T, L)), mode="drop"
        )
        return w1_out, w2_out, imm_out, lengths, n_choices_new
