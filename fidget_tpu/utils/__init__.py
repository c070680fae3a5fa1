"""Utilities: profiling, tracing, and pipeline statistics.

The reference's only observability is GPU timestamp queries and the
tape interpreter's executed-op counter (fidget-wgpu/src/voxel/mod.rs:
2599-2617, shaders/tape_interpreter.wgsl:27-31). The TPU equivalents:
`trace` wraps `jax.profiler` for XPlane traces viewable in
TensorBoard/XProf, `timed` measures wall-clock around blocking device
work, and `pipeline_stats` reports per-frame culling and tape-length
statistics — the op-counter analog for sizing interpreter work.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Captures a jax.profiler trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str = "", sink=None):
    """Wall-clock timer; blocks on nothing itself — wrap blocking code."""
    t0 = time.perf_counter()
    result = {}
    try:
        yield result
    finally:
        result["seconds"] = time.perf_counter() - t0
        result["label"] = label
        if sink is not None:
            sink(result)


@dataclass
class PipelineStats:
    """Per-frame work statistics for a 2D MPR frame."""

    n_root: int
    root_active: int
    root_inside: int
    root_outside: int
    simplified_mean: float
    simplified_max: int
    interp_steps: int  # sum of executed leaf tape lengths x lane blocks

    def __str__(self) -> str:
        return (
            f"roots {self.root_active}/{self.n_root} active "
            f"({self.root_inside} in / {self.root_outside} out), "
            f"tape len mean {self.simplified_mean:.0f} "
            f"max {self.simplified_max}, "
            f"~{self.interp_steps/1e3:.0f}k leaf steps"
        )


def pipeline_stats(
    renderer, world_to_model=None, *, z: float = 0.0, vars=None
) -> PipelineStats:
    """Runs the root interval pass + simplification of a PixelRenderer
    and reports culling/tape statistics (the executed-op counter
    analog, tape_interpreter.wgsl:27-31)."""
    import jax.numpy as jnp

    from ..eval.arith import IntervalMode
    from ..eval.pallas_interp import interp_interval

    r = renderer
    mat = jnp.asarray(r._mat4(world_to_model))
    vec = jnp.asarray(r._var_vec(vars))
    im = IntervalMode(jnp)
    x0 = jnp.asarray(r.tile_x0)
    y0 = jnp.asarray(r.tile_y0)
    var_lo, var_hi = r._interval_vars(
        im, mat, jnp.float32(z), vec,
        (x0, x0 + r.T0), (y0, y0 + r.T0), r.s0r, (1,),
    )
    olo, ohi, choices = interp_interval(
        r.packed.w1, r.packed.w2, r.packed.imm, r.packed.lengths,
        var_lo, var_hi, nf=r.nf, n_inputs=r.n_inputs, n_outputs=1,
        s0=r.s0r, c_words=r.c_words, interpret=r.interpret,
        op_order=getattr(r, "op_order", None),
    )
    lo = np.asarray(olo[0, 0]).reshape(-1)[: r.n0]
    hi = np.asarray(ohi[0, 0]).reshape(-1)[: r.n0]
    inside = hi < 0
    outside = lo > 0
    active = ~(inside | outside)
    _, _, _, lens, _ = r.simplifier.simplify_packed(
        choices, n_tiles=r.n0, interpret=r.interpret
    )
    lens = np.asarray(lens)
    act_lens = lens[active] if active.any() else np.zeros(1)
    return PipelineStats(
        n_root=int(r.n0),
        root_active=int(active.sum()),
        root_inside=int(inside.sum()),
        root_outside=int(outside.sum()),
        simplified_mean=float(act_lens.mean()),
        simplified_max=int(act_lens.max()),
        interp_steps=int(act_lens.sum()) * r.s0l,
    )
