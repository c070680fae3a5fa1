"""Real-TPU correctness sweep (VERDICT r4 item 5).

The pytest suite runs every Pallas kernel in INTERPRET mode on the CPU
mesh; this harness executes the same canonical matrices through the
REAL Mosaic-compiled kernels on the attached TPU and compares against
the host oracles — the analog of the reference running its full per-op
suite against the JIT backend exactly as against the VM
(fidget-core/src/eval/test/mod.rs:346-384).

Sections:
  op_matrix   — all TapeOps x {float, interval, grad} x operand
                position over NaN/inf/pi spicy inputs vs the host
                unrolled evaluator (tests/test_kernel_ops.py's cases);
  golden      — hi.vm / quarter.vm 32^2 ASCII goldens through BOTH the
                interpreter pipeline and the tiled-unrolled (union)
                pipeline on hardware;
  voxel_64    — 64^3 heightmap exact vs the host brute oracle;
  mesh_d6     — colonnade depth-6 MDC build on hardware: closed
                2-manifold + triangle count vs the interpret-mode build.

Writes PARITY_TPU_r{N}.json (set ROUND env or defaults to 05).
"""

import json
import math
import os
import sys
import time

#: PARITY_INTERPRET=1 validates the harness mechanics on CPU
_INTERP = os.environ.get("PARITY_INTERPRET") == "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _compare(got, want, label, detail=None):
    from tests import test_kernel_ops as K

    # XLA:TPU's log differs from numpy's by up to ~8e-5 relative
    # (measured, PARITY run 1) — pure transcendental ULP variance, the
    # same latitude the reference's float-comparisons grant backends
    rtol = 2e-4 if ":LN" in label or "EXP" in label else 2e-5
    try:
        K._assert_matches(got, want, label, rtol=rtol)
        return True
    except AssertionError:
        if detail is not None:
            g = np.asarray(got).reshape(-1)[: K.NPAIR]
            w = np.asarray(want).reshape(-1)[: K.NPAIR]
            m = np.isfinite(g) & np.isfinite(w)
            rel = np.abs(g[m] - w[m]) / np.maximum(np.abs(w[m]), 1e-20)
            nan_mismatch = int((np.isnan(g) != np.isnan(w)).sum())
            detail[label] = {
                "max_rel": float(rel.max()) if m.any() else None,
                "nan_mismatch": nan_mismatch,
            }
        return False


def run_op_matrix(report):
    from tests import test_kernel_ops as K
    from fidget_tpu import Var
    from fidget_tpu.compiler.pack import pack_tapes
    from fidget_tpu.eval.arith import FloatMode, GradMode, IntervalMode
    from fidget_tpu.eval.pallas_interp import (
        interp_float,
        interp_grad,
        interp_interval,
    )
    from fidget_tpu.eval.softmath import kernel_namespace
    from fidget_tpu.eval.unrolled import eval_tape

    S0, LANES = K.S0, K.LANES
    CASES, TAPES = K.CASES, K.TAPES
    T = len(TAPES)
    packed = pack_tapes(TAPES, capacity=32)
    results = {}

    # ---- float ------------------------------------------------------
    out = np.asarray(interp_float(
        packed.w1, packed.w2, packed.imm, packed.lengths,
        K._vars_float(), nf=packed.nf, n_inputs=2, n_outputs=1, s0=S0,
        interpret=_INTERP,
    ))
    fm = FloatMode(kernel_namespace(np))
    fails = []
    detail = {}
    for t_i, (label, tape) in enumerate(CASES):
        with np.errstate(all="ignore"):
            (want,), _ = eval_tape(tape, fm, K._host_inputs(tape, "float"))
        if not _compare(out[t_i, 0], want, label, detail):
            fails.append(label)
    results["float"] = {"cases": T, "fail": fails, "detail": detail}

    # ---- interval ---------------------------------------------------
    var_lo = np.zeros((T, 2, S0, 128), np.float32)
    var_hi = np.zeros((T, 2, S0, 128), np.float32)
    for t_i, tape in enumerate(TAPES):
        for v, i in tape.var_map.items():
            lo, hi = (
                (K.A_LO, K.A_HI) if v == Var.X else (K.B_LO, K.B_HI)
            )
            var_lo[t_i, i] = lo.reshape(S0, 128)
            var_hi[t_i, i] = hi.reshape(S0, 128)
    olo, ohi, _ = interp_interval(
        packed.w1, packed.w2, packed.imm, packed.lengths, var_lo, var_hi,
        nf=packed.nf, n_inputs=2, n_outputs=1, s0=S0, c_words=1,
        interpret=_INTERP,
    )
    glo = np.asarray(olo)
    ghi = np.asarray(ohi)
    im = IntervalMode(kernel_namespace(np))
    fails = []
    detail = {}
    for t_i, (label, tape) in enumerate(CASES):
        with np.errstate(all="ignore"):
            ((wlo, whi),), _ = eval_tape(
                tape, im, K._host_inputs(tape, "interval")
            )
        ok = _compare(glo[t_i, 0], wlo, label, detail) and _compare(
            ghi[t_i, 0], whi, label, detail
        )
        if not ok:
            fails.append(label)
    results["interval"] = {"cases": T, "fail": fails, "detail": detail}

    # ---- grad -------------------------------------------------------
    duals = np.zeros((T, 2, 4, S0, 128), np.float32)
    one = np.ones(LANES, np.float32).reshape(S0, 128)
    for t_i, tape in enumerate(TAPES):
        for v, i in tape.var_map.items():
            duals[t_i, i, 0] = (
                K.A_PTS if v == Var.X else K.B_PTS
            ).reshape(S0, 128)
            duals[t_i, i, 1 if v == Var.X else 2] = one
    g = np.asarray(interp_grad(
        packed.w1, packed.w2, packed.imm, packed.lengths, duals,
        nf=packed.nf, n_inputs=2, n_outputs=1, s0=S0, interpret=_INTERP,
    ))
    gm = GradMode(kernel_namespace(np))
    fails = []
    detail = {}
    for t_i, (label, tape) in enumerate(CASES):
        with np.errstate(all="ignore"):
            (want,), _ = eval_tape(tape, gm, K._host_inputs(tape, "grad"))
        ok = all(
            _compare(g[t_i, 0, c], want[c], label, detail)
            for c in range(4)
        )
        if not ok:
            fails.append(label)
    results["grad"] = {"cases": T, "fail": fails, "detail": detail}
    report["op_matrix"] = results


def run_golden(report):
    from tests.test_golden_images import HI_32, QUARTER_32
    from fidget_tpu.io.models import load_vm_tape
    from fidget_tpu.render.region import ImageSize
    from fidget_tpu.render.render2d import PixelRenderer

    out = {}
    for name, golden in (("hi.vm", HI_32), ("quarter.vm", QUARTER_32)):
        tape = load_vm_tape(name)
        want = np.array(
            [[c == "X" for c in row] for row in golden], bool
        )
        r = PixelRenderer(tape, ImageSize(32, 32), interpret=_INTERP)
        got_i = r.render().inside()
        got_u = r.render_unrolled(
            tile_size=8, leaf="union", block_px=16
        ).inside()
        out[name] = {
            "interp": bool((got_i == want).all()),
            "union_unrolled": bool((got_u == want).all()),
        }
    report["golden"] = out


def run_voxel(report):
    from fidget_tpu.io.models import load_script
    from fidget_tpu.render.region import VoxelSize
    from fidget_tpu.render.render3d import VoxelRenderer
    from fidget_tpu.shape import Shape

    tree = load_script("gyroid-sphere.rhai")
    tape = Shape.from_tree(tree).tape()
    r = VoxelRenderer(tape, VoxelSize(64, 64, 64), interpret=_INTERP)
    got = r.render(mode="heightmap").depth
    want = r.render_brute().depth
    report["voxel_64"] = {
        "exact": bool((got == want).all()),
        "mismatch_frac": float((got != want).mean()),
    }


def run_mesh(report):
    from fidget_tpu.io.models import load_vm_tape
    from fidget_tpu.mesh import Settings, build_mesh

    tape = load_vm_tape("colonnade.vm")
    t0 = time.time()
    mesh = build_mesh(tape, Settings(depth=6))
    wall = time.time() - t0
    tris = np.asarray(mesh.triangles, np.int64)
    e = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]])
    e.sort(axis=1)
    _, counts = np.unique(e, axis=0, return_counts=True)
    report["mesh_d6"] = {
        "triangles": int(len(tris)),
        "manifold": bool((counts == 2).all()),
        "wall_s": round(wall, 2),
    }


def main():
    import jax

    plat = jax.devices()[0].platform
    report = {
        "platform": plat,
        "device": str(jax.devices()[0]),
    }
    for fn in (run_op_matrix, run_golden, run_voxel, run_mesh):
        try:
            fn(report)
        except Exception as ex:
            report[fn.__name__] = f"ERROR {type(ex).__name__}: {ex}"
    ok = (
        not any(isinstance(v, str) and v.startswith("ERROR")
                for v in report.values())
        and all(not v["fail"] for v in report["op_matrix"].values())
        and all(
            all(m.values()) for m in report["golden"].values()
        )
        and report["voxel_64"]["exact"]
        and report["mesh_d6"]["manifold"]
    )
    report["all_green"] = ok
    rnd = os.environ.get("ROUND", "05")
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"PARITY_TPU_r{rnd}.json",
    )
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
