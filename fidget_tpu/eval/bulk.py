"""Bulk flat-array evaluation helpers.

Wraps the Pallas tape interpreters for consumers that hold flat point
lists (the meshing pipeline, the solver) rather than renderer-shaped
lane planes: points are padded and chunked into [T, s0, 128] lane
blocks sized to the register file's VMEM footprint, with the tape
broadcast across instances.

This is the TPU analog of the reference's `BulkEvaluator` trait
(fidget-core/src/eval/bulk.rs:23-58) — evaluation is always batched;
there is no scalar path.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..compiler.pack import PackedTapes, pack_tapes
from ..compiler.tape import Tape
from .pallas_interp import (
    default_interpret,
    interp_float,
    interp_grad,
    interp_interval,
)

_VMEM_BUDGET = 8 * 2**20


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _lane_block(nf: int, planes: int) -> int:
    """s0 such that `planes` register scratches of [nf, s0, 128] f32
    fit the VMEM budget."""
    s0 = _VMEM_BUDGET // (max(1, nf) * planes * 128 * 4)
    s0 = 1 << max(3, s0.bit_length() - 1)
    return int(max(8, min(256, s0)))


class BulkEvaluator:
    """Compiled bulk evaluator for one tape (all three value modes)."""

    def __init__(self, tape: Tape, *, interpret: bool | None = None):
        self.tape = tape
        self.packed = pack_tapes([tape])
        self.nf = tape.reg_count + tape.mem_count
        # padded to >= 1 so constant-only tapes still build var planes
        self.n_inputs = max(1, len(tape.var_map))
        self.n_outputs = tape.output_count
        self.c_words = max(1, -(-tape.choice_count // 16))
        self.axis_of = {v.kind: i for v, i in tape.var_map.items()}
        self.interpret = default_interpret() if interpret is None else interpret

    # ------------------------------------------------------------------

    def _planes(self, arrays, s0, planes_per_var=None):
        """arrays: dict input_index -> [N] (or [P, N] for dual planes).
        Returns ([T, V, (P,) s0, 128], T, N).

        The instance count T is rounded up to a power of two: callers
        (octree levels, edge-search rounds) arrive with data-dependent
        sizes, and bucketing makes the jit cache hit across them at the
        cost of <2x padded lanes (zero-length work per padded block)."""
        n = None
        for a in arrays.values():
            n = a.shape[-1]
            break
        lanes = _ceil_to(max(1, n), s0 * 128)
        T = lanes // (s0 * 128)
        T = 1 << (T - 1).bit_length()
        lanes = T * s0 * 128
        V = self.n_inputs
        P = planes_per_var
        shape = (T, V, s0, 128) if P is None else (T, V, P, s0, 128)
        out = jnp.zeros(shape, jnp.float32)
        for idx, a in arrays.items():
            a = jnp.asarray(a, jnp.float32)
            if P is None:
                a = jnp.pad(a, (0, lanes - n)).reshape(T, s0, 128)
                out = out.at[:, idx].set(a)
            else:
                a = jnp.pad(a, ((0, 0), (0, lanes - n))).reshape(P, T, s0, 128)
                out = out.at[:, idx].set(jnp.moveaxis(a, 0, 1))
        return out, T, n

    def _inputs_flat(self, x, y, z, var_vec):
        x = jnp.asarray(x, jnp.float32).reshape(-1)
        arrays = {}
        for kind, arr in (("x", x), ("y", y), ("z", z)):
            idx = self.axis_of.get(kind)
            if idx is not None:
                arrays[idx] = jnp.asarray(arr, jnp.float32).reshape(-1)
        if var_vec is not None:
            for i, v in enumerate(np.asarray(var_vec, np.float32)):
                if i not in arrays:
                    arrays[i] = jnp.broadcast_to(
                        jnp.float32(v), x.shape
                    ).reshape(-1)
        for i in range(self.n_inputs):
            arrays.setdefault(i, jnp.zeros_like(x))
        return arrays

    def _bcast_tape(self, T, s0=None, n=None):
        """Tape broadcast over T instances; instances whose lane block
        lies entirely in the power-of-two padding get zero lengths so
        they cost nothing."""
        p = self.packed
        lens = jnp.broadcast_to(p.lengths, (T,))
        if s0 is not None and n is not None:
            used = -(-max(1, n) // (s0 * 128))
            lens = jnp.where(jnp.arange(T) < used, lens, 0)
        return (
            jnp.broadcast_to(p.w1, (T,) + p.w1.shape[1:]),
            jnp.broadcast_to(p.w2, (T,) + p.w2.shape[1:]),
            jnp.broadcast_to(p.imm, (T,) + p.imm.shape[1:]),
            lens,
        )

    # ------------------------------------------------------------------

    def eval(self, x, y, z, var_vec=None):
        """Point mode over flat arrays -> [n_outputs, N] f32."""
        s0 = _lane_block(self.nf, 1)
        arrays = self._inputs_flat(x, y, z, var_vec)
        vars_, T, n = self._planes(arrays, s0)
        w1, w2, imm, lens = self._bcast_tape(T, s0, n)
        out = interp_float(
            w1, w2, imm, lens, vars_,
            nf=self.nf, n_inputs=self.n_inputs, n_outputs=self.n_outputs,
            s0=s0, interpret=self.interpret,
        )  # [T, O, s0, 128]
        out = jnp.moveaxis(out, 1, 0).reshape(self.n_outputs, -1)[:, :n]
        return out

    def eval_interval(self, xi, yi, zi, var_vec=None, *, capture=False):
        """Interval mode over flat (lo, hi) arrays.

        Returns (lo, hi) [O, N] — plus packed per-lane choice words
        [B, CW, s0, 128] and lane geometry (s0, n) when capture=True,
        ready for DeviceSimplifier.simplify_packed."""
        s0 = _lane_block(self.nf, 2)
        los = self._inputs_flat(xi[0], yi[0], zi[0], var_vec)
        his = self._inputs_flat(xi[1], yi[1], zi[1], var_vec)
        lo_p, T, n = self._planes(los, s0)
        hi_p, _, _ = self._planes(his, s0)
        w1, w2, imm, lens = self._bcast_tape(T, s0, n)
        olo, ohi, choices = interp_interval(
            w1, w2, imm, lens, lo_p, hi_p,
            nf=self.nf, n_inputs=self.n_inputs, n_outputs=self.n_outputs,
            s0=s0, c_words=self.c_words, interpret=self.interpret,
        )
        olo = jnp.moveaxis(olo, 1, 0).reshape(self.n_outputs, -1)[:, :n]
        ohi = jnp.moveaxis(ohi, 1, 0).reshape(self.n_outputs, -1)[:, :n]
        if capture:
            return (olo, ohi), choices, (s0, n)
        return olo, ohi

    def eval_grad(self, x, y, z, var_vec=None):
        """Forward duals seeded on the spatial axes -> [O, 4, N]."""
        s0 = _lane_block(self.nf, 4)
        x = jnp.asarray(x, jnp.float32).reshape(-1)
        y = jnp.asarray(y, jnp.float32).reshape(-1)
        z = jnp.asarray(z, jnp.float32).reshape(-1)
        zero = jnp.zeros_like(x)
        one = jnp.ones_like(x)
        arrays = {}
        seeds = {"x": (one, zero, zero), "y": (zero, one, zero),
                 "z": (zero, zero, one)}
        vals = {"x": x, "y": y, "z": z}
        for kind in ("x", "y", "z"):
            idx = self.axis_of.get(kind)
            if idx is not None:
                arrays[idx] = jnp.stack((vals[kind],) + seeds[kind])
        if var_vec is not None:
            for i, v in enumerate(np.asarray(var_vec, np.float32)):
                if i not in arrays:
                    arrays[i] = jnp.stack(
                        (jnp.broadcast_to(jnp.float32(v), x.shape),
                         zero, zero, zero)
                    )
        for i in range(self.n_inputs):
            if i not in arrays:
                arrays[i] = jnp.stack((zero, zero, zero, zero))
        vars_, T, n = self._planes(arrays, s0, planes_per_var=4)
        w1, w2, imm, lens = self._bcast_tape(T, s0, n)
        g = interp_grad(
            w1, w2, imm, lens, vars_,
            nf=self.nf, n_inputs=self.n_inputs, n_outputs=self.n_outputs,
            s0=s0, interpret=self.interpret,
        )  # [T, O, 4, s0, 128]
        g = jnp.moveaxis(g, (1, 2), (0, 1)).reshape(self.n_outputs, 4, -1)
        return g[:, :, :n]
