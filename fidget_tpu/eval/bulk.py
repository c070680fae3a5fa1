"""Bulk flat-array evaluation helpers.

Wraps the Pallas tape interpreters for consumers that hold flat point
lists (the meshing pipeline, the solver) rather than renderer-shaped
lane planes: points are padded and chunked into [T, s0, 128] lane
blocks sized to the register file's VMEM footprint, with the tape
broadcast across instances.

This is the TPU analog of the reference's `BulkEvaluator` trait
(fidget-core/src/eval/bulk.rs:23-58) — evaluation is always batched;
there is no scalar path.

Dispatch discipline: input planes are assembled in **NumPy** (free on
the host) and each eval is ONE jitted device call + one transfer.
Building planes with eager `jnp` ops costs one device round trip per
op (~30 ms each over a dev tunnel), which dominated the meshing
pipeline before this layout. The `signs=` / `classify=` flags further
shrink the downlink to one bool per lane for consumers that only need
occupancy (the octree build, edge search, and collapse loops).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..compiler.pack import frequency_op_order, pack_tapes
from ..compiler.tape import Tape
from .pallas_interp import (
    _N_OPS,
    tape_n_ops,
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


def _bcast_in(w1, w2, imm, lengths, used, T):
    """Tape broadcast over T instances inside jit; instances whose lane
    block lies entirely in the power-of-two padding get zero lengths."""
    lens = jnp.broadcast_to(lengths, (T,))
    lens = jnp.where(jnp.arange(T) < used, lens, 0)
    return (
        jnp.broadcast_to(w1, (T,) + w1.shape[1:]),
        jnp.broadcast_to(w2, (T,) + w2.shape[1:]),
        jnp.broadcast_to(imm, (T,) + imm.shape[1:]),
        lens,
    )


@functools.partial(
    jax.jit,
    static_argnames=("T", "nf", "n_inputs", "n_outputs", "s0", "signs",
                     "interpret", "op_order", "n_ops"),
)
def _float_core(
    w1, w2, imm, lengths, vars_, used, *, T, nf, n_inputs, n_outputs, s0,
    signs, interpret, op_order=None, n_ops=_N_OPS,
):
    w1b, w2b, immb, lens = _bcast_in(w1, w2, imm, lengths, used, T)
    out = interp_float(
        w1b, w2b, immb, lens, vars_,
        nf=nf, n_inputs=n_inputs, n_outputs=n_outputs, s0=s0,
        interpret=interpret, op_order=op_order, n_ops=n_ops,
    )  # [T, O, s0, 128]
    out = jnp.moveaxis(out, 1, 0)
    return (out < 0.0) if signs else out


@functools.partial(
    jax.jit,
    static_argnames=("T", "nf", "n_inputs", "n_outputs", "s0", "c_words",
                     "classify", "capture", "interpret", "op_order",
                     "n_ops"),
)
def _interval_core(
    w1, w2, imm, lengths, lo_p, hi_p, used, *, T, nf, n_inputs, n_outputs,
    s0, c_words, classify, capture, interpret, op_order=None, n_ops=_N_OPS,
):
    w1b, w2b, immb, lens = _bcast_in(w1, w2, imm, lengths, used, T)
    olo, ohi, choices = interp_interval(
        w1b, w2b, immb, lens, lo_p, hi_p,
        nf=nf, n_inputs=n_inputs, n_outputs=n_outputs, s0=s0,
        c_words=c_words, interpret=interpret, op_order=op_order,
        n_ops=n_ops,
    )
    olo = jnp.moveaxis(olo, 1, 0)
    ohi = jnp.moveaxis(ohi, 1, 0)
    if classify:
        # neither proven empty nor proven full
        res = ~((olo > 0.0) | (ohi < 0.0))
    else:
        res = (olo, ohi)
    return (res, choices) if capture else res


@functools.partial(
    jax.jit,
    static_argnames=("T", "nf", "n_inputs", "n_outputs", "s0", "interpret",
                     "op_order", "n_ops"),
)
def _grad_core(
    w1, w2, imm, lengths, vars_, used, *, T, nf, n_inputs, n_outputs, s0,
    interpret, op_order=None, n_ops=_N_OPS,
):
    w1b, w2b, immb, lens = _bcast_in(w1, w2, imm, lengths, used, T)
    g = interp_grad(
        w1b, w2b, immb, lens, vars_,
        nf=nf, n_inputs=n_inputs, n_outputs=n_outputs, s0=s0,
        interpret=interpret, op_order=op_order, n_ops=n_ops,
    )  # [T, O, 4, s0, 128]
    return jnp.moveaxis(g, (1, 2), (0, 1))  # [O, 4, T, s0, 128]


class BulkEvaluator:
    """Compiled bulk evaluator for one tape (all three value modes)."""

    def __init__(self, tape: Tape, *, interpret: bool | None = None):
        self.tape = tape
        self.interpret = default_interpret() if interpret is None else interpret
        if self.interpret:
            # interpret mode (CPU tests): per-shape opcode renumbering
            # buys nothing, but every distinct static-arg combo costs
            # an XLA:CPU compile of the interpreted kernel — use the
            # canonical order and bucket the register-file / arena
            # dims so different shapes share compiled kernels
            self.op_order = None
            self.packed = pack_tapes(
                [tape],
                capacity=max(
                    64, 1 << (len(tape) - 1).bit_length()
                ),
            )
            self.nf = _ceil_to(max(tape.reg_count + tape.mem_count, 8), 8)
        else:
            self.op_order = frequency_op_order(tape)
            self.packed = pack_tapes([tape], op_order=self.op_order)
            self.nf = tape.reg_count + tape.mem_count
        # dispatch-vocabulary truncation: the kernel switch carries
        # only the branch positions this tape can reach (the ~11 ns/
        # branch/step if-chain is the interpreter's dominant cost);
        # interpret mode keeps the full vocabulary so CPU-test kernels
        # stay shared across shapes
        self.n_ops = (
            _N_OPS if self.interpret else tape_n_ops(tape, self.op_order)
        )
        # padded to >= 1 so constant-only tapes still build var planes
        self.n_inputs = max(1, len(tape.var_map))
        self.n_outputs = tape.output_count
        self.c_words = max(1, -(-tape.choice_count // 16))
        self.axis_of = {v.kind: i for v, i in tape.var_map.items()}

    # ------------------------------------------------------------------

    def _planes_np(self, arrays, s0, planes_per_var=None):
        """arrays: dict input_index -> np [N] (or [P, N] dual planes).
        Returns (np [T, V, (P,) s0, 128] f32, T, used, N).

        The instance count T is rounded up to a power of two: callers
        (octree levels, edge-search rounds) arrive with data-dependent
        sizes, and bucketing makes the jit cache hit across them at the
        cost of <2x padded lanes. Assembly is pure NumPy — zero device
        dispatches."""
        n = None
        for a in arrays.values():
            n = a.shape[-1]
            break
        lanes = _ceil_to(max(1, n), s0 * 128)
        T = lanes // (s0 * 128)
        T = 1 << (T - 1).bit_length()
        used = -(-max(1, n) // (s0 * 128))
        lanes = T * s0 * 128
        V = self.n_inputs
        P = planes_per_var
        shape = (T, V, s0, 128) if P is None else (T, V, P, s0, 128)
        out = np.zeros(shape, np.float32)
        for idx, a in arrays.items():
            a = np.asarray(a, np.float32)
            if P is None:
                a = np.pad(a, (0, lanes - n)).reshape(T, s0, 128)
                out[:, idx] = a
            else:
                a = np.pad(a, ((0, 0), (0, lanes - n))).reshape(
                    P, T, s0, 128
                )
                out[:, idx] = np.moveaxis(a, 0, 1)
        return out, T, used, n

    def _inputs_flat(self, x, y, z, var_vec):
        x = np.asarray(x, np.float32).reshape(-1)
        arrays = {}
        for kind, arr in (("x", x), ("y", y), ("z", z)):
            idx = self.axis_of.get(kind)
            if idx is not None:
                arrays[idx] = np.asarray(arr, np.float32).reshape(-1)
        if var_vec is not None:
            for i, v in enumerate(np.asarray(var_vec, np.float32)):
                if i not in arrays:
                    arrays[i] = np.broadcast_to(
                        np.float32(v), x.shape
                    ).reshape(-1)
        for i in range(self.n_inputs):
            arrays.setdefault(i, np.zeros_like(x))
        return arrays

    def _tape_args(self):
        # device-resident once: the packed tape is immutable, and
        # re-wrapping per call would re-transfer it on every one of the
        # thousands of dispatches a mesh build makes
        cached = getattr(self, "_tape_args_cache", None)
        if cached is None:
            p = self.packed
            cached = self._tape_args_cache = (
                jnp.asarray(p.w1), jnp.asarray(p.w2), jnp.asarray(p.imm),
                jnp.asarray(p.lengths),
            )
        return cached

    # ------------------------------------------------------------------

    def eval(self, x, y, z, var_vec=None, *, signs: bool = False):
        """Point mode over flat arrays -> np [n_outputs, N] f32.

        signs=True returns np bool occupancy (value < 0) instead —
        one device dispatch, one bool-per-lane transfer."""
        s0 = _lane_block(self.nf, 1)
        arrays = self._inputs_flat(x, y, z, var_vec)
        vars_np, T, used, n = self._planes_np(arrays, s0)
        out = _float_core(
            *self._tape_args(), jnp.asarray(vars_np), jnp.int32(used),
            T=T, nf=self.nf, n_inputs=self.n_inputs,
            n_outputs=self.n_outputs, s0=s0, signs=signs,
            n_ops=self.n_ops,
            interpret=self.interpret, op_order=self.op_order,
        )
        return np.asarray(out).reshape(self.n_outputs, -1)[:, :n]

    def eval_interval(
        self, xi, yi, zi, var_vec=None, *, capture=False, classify=False,
    ):
        """Interval mode over flat (lo, hi) arrays.

        Returns (lo, hi) np [O, N] — or np bool [O, N] "active" (not
        provably empty/full) when classify=True. capture=True appends
        packed per-lane choice words [B, CW, s0, 128] (device array)
        and lane geometry (s0, n), ready for
        DeviceSimplifier.simplify_packed."""
        s0 = _lane_block(self.nf, 2)
        los = self._inputs_flat(xi[0], yi[0], zi[0], var_vec)
        his = self._inputs_flat(xi[1], yi[1], zi[1], var_vec)
        lo_np, T, used, n = self._planes_np(los, s0)
        hi_np, _, _, _ = self._planes_np(his, s0)
        res = _interval_core(
            *self._tape_args(), jnp.asarray(lo_np), jnp.asarray(hi_np),
            jnp.int32(used),
            T=T, nf=self.nf, n_inputs=self.n_inputs,
            n_outputs=self.n_outputs, s0=s0, c_words=self.c_words,
            classify=classify, capture=capture, interpret=self.interpret,
            n_ops=self.n_ops,
            op_order=self.op_order,
        )
        if capture:
            res, choices = res
        if classify:
            out = np.asarray(res).reshape(self.n_outputs, -1)[:, :n]
        else:
            olo, ohi = res
            out = (
                np.asarray(olo).reshape(self.n_outputs, -1)[:, :n],
                np.asarray(ohi).reshape(self.n_outputs, -1)[:, :n],
            )
        if capture:
            return out, choices, (s0, n)
        return out

    def eval_grad(self, x, y, z, var_vec=None):
        """Forward duals seeded on the spatial axes -> np [O, 4, N]."""
        s0 = _lane_block(self.nf, 4)
        x = np.asarray(x, np.float32).reshape(-1)
        y = np.asarray(y, np.float32).reshape(-1)
        z = np.asarray(z, np.float32).reshape(-1)
        zero = np.zeros_like(x)
        one = np.ones_like(x)
        arrays = {}
        seeds = {"x": (one, zero, zero), "y": (zero, one, zero),
                 "z": (zero, zero, one)}
        vals = {"x": x, "y": y, "z": z}
        for kind in ("x", "y", "z"):
            idx = self.axis_of.get(kind)
            if idx is not None:
                arrays[idx] = np.stack((vals[kind],) + seeds[kind])
        if var_vec is not None:
            for i, v in enumerate(np.asarray(var_vec, np.float32)):
                if i not in arrays:
                    arrays[i] = np.stack(
                        (np.broadcast_to(np.float32(v), x.shape),
                         zero, zero, zero)
                    )
        for i in range(self.n_inputs):
            if i not in arrays:
                arrays[i] = np.stack((zero, zero, zero, zero))
        vars_np, T, used, n = self._planes_np(arrays, s0, planes_per_var=4)
        g = _grad_core(
            *self._tape_args(), jnp.asarray(vars_np), jnp.int32(used),
            T=T, nf=self.nf, n_inputs=self.n_inputs,
            n_outputs=self.n_outputs, s0=s0, interpret=self.interpret,
            op_order=self.op_order, n_ops=self.n_ops,
        )
        return np.asarray(g).reshape(self.n_outputs, 4, -1)[:, :, :n]
