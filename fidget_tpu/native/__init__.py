"""Native (C++) runtime components, bound via ctypes.

The compute path is JAX/Pallas; the host runtime around it — model
parsing and tape compilation, the reference's per-shape hot path
(fidget-core/src/compiler) — has a native implementation compiled on
demand with the system toolchain. Everything degrades gracefully to
the pure-Python path when no compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import subprocess
import tempfile

import numpy as np

from ..compiler.tape import Tape
from ..core.var import Var, VarMap

_SRC = pathlib.Path(__file__).with_name("tape_compiler.cpp")
_LIB = None
_TRIED = False


class _FidgetTape(ctypes.Structure):
    _fields_ = [
        ("n_ops", ctypes.c_int32),
        ("reg_count", ctypes.c_int32),
        ("mem_count", ctypes.c_int32),
        ("choice_count", ctypes.c_int32),
        ("n_inputs", ctypes.c_int32),
        ("axis_input", ctypes.c_int32 * 3),
        ("op", ctypes.POINTER(ctypes.c_int32)),
        ("out", ctypes.POINTER(ctypes.c_int32)),
        ("a", ctypes.POINTER(ctypes.c_int32)),
        ("b", ctypes.POINTER(ctypes.c_int32)),
        ("imm", ctypes.POINTER(ctypes.c_float)),
        ("aux", ctypes.POINTER(ctypes.c_int32)),
        ("error", ctypes.c_char * 256),
    ]


def _build_dir() -> pathlib.Path:
    d = os.environ.get("FIDGET_TPU_CACHE")
    if d:
        return pathlib.Path(d)
    return pathlib.Path(tempfile.gettempdir()) / "fidget_tpu_native"


def _load():
    """Builds (if needed) and loads the shared library; None on failure."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        src = _SRC.read_bytes()
        tag = hashlib.sha256(src).hexdigest()[:16]
        out = _build_dir() / f"tape_compiler_{tag}.so"
        if not out.exists():
            out.parent.mkdir(parents=True, exist_ok=True)
            tmp = out.with_suffix(".so.tmp")
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                 str(_SRC), "-o", str(tmp)],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp, out)
        lib = ctypes.CDLL(str(out))
        lib.fidget_compile_vm.restype = ctypes.POINTER(_FidgetTape)
        lib.fidget_compile_vm.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.fidget_free_tape.argtypes = [ctypes.POINTER(_FidgetTape)]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def compile_vm(text: str, reg_limit: int = 255) -> Tape | None:
    """Compiles `.vm` text natively; None when the toolchain is absent.

    Raises ValueError on malformed input (same contract as
    Context.from_text + lower).
    """
    lib = _load()
    if lib is None:
        return None
    ptr = lib.fidget_compile_vm(text.encode(), reg_limit)
    try:
        t = ptr.contents
        err = bytes(t.error).split(b"\0")[0]
        if err:
            raise ValueError(err.decode())
        n = t.n_ops
        arrays = {}
        for name, ctype, dtype in [
            ("op", ctypes.c_int32, np.int32),
            ("out", ctypes.c_int32, np.int32),
            ("a", ctypes.c_int32, np.int32),
            ("b", ctypes.c_int32, np.int32),
            ("imm", ctypes.c_float, np.float32),
            ("aux", ctypes.c_int32, np.int32),
        ]:
            src = np.ctypeslib.as_array(getattr(t, name), shape=(n,))
            arrays[name] = np.array(src, dtype=dtype)  # owned copy
        var_map = VarMap()
        order = sorted(
            (int(t.axis_input[k]), k)
            for k in range(3)
            if t.axis_input[k] >= 0
        )
        for _, k in order:
            var_map.insert((Var.X, Var.Y, Var.Z)[k])
        return Tape(
            arrays["op"], arrays["out"], arrays["a"], arrays["b"],
            arrays["imm"], arrays["aux"],
            reg_count=int(t.reg_count), mem_count=int(t.mem_count),
            choice_count=int(t.choice_count), output_count=1,
            var_map=var_map,
        )
    finally:
        lib.fidget_free_tape(ptr)


# ----------------------------------------------------------------------
# mesh host kernels (batched QEF solve)

_MESH_SRC = pathlib.Path(__file__).with_name("mesh_kernels.cpp")
_MESH_LIB = None
_MESH_TRIED = False


def _load_mesh():
    """Builds (if needed) and loads the mesh-kernel library."""
    global _MESH_LIB, _MESH_TRIED
    if _MESH_TRIED:
        return _MESH_LIB
    _MESH_TRIED = True
    try:
        src = _MESH_SRC.read_bytes()
        tag = hashlib.sha256(src).hexdigest()[:16]
        out = _build_dir() / f"mesh_kernels_{tag}.so"
        if not out.exists():
            out.parent.mkdir(parents=True, exist_ok=True)
            tmp = out.with_suffix(".so.tmp")
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 str(_MESH_SRC), "-o", str(tmp)],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp, out)
        lib = ctypes.CDLL(str(out))
        pd = ctypes.POINTER(ctypes.c_double)
        lib.fidget_qef_solve.restype = None
        lib.fidget_qef_solve.argtypes = [ctypes.c_int64, pd, pd, pd, pd]
        _MESH_LIB = lib
    except Exception:
        _MESH_LIB = None
    return _MESH_LIB


def qef_solve_batch(AtA, Atb, mass):
    """Native batched truncated QEF solve; None when unavailable.

    Same contract as mesh/collapse._solve_qef's numpy body (which is
    the fallback): [n,3,3], [n,3], [n,3] float64 -> [n,3] float64."""
    lib = _load_mesh()
    if lib is None:
        return None
    AtA = np.ascontiguousarray(AtA, np.float64)
    Atb = np.ascontiguousarray(Atb, np.float64)
    mass = np.ascontiguousarray(mass, np.float64)
    n = len(mass)
    out = np.empty((n, 3), np.float64)
    pd = ctypes.POINTER(ctypes.c_double)
    lib.fidget_qef_solve(
        ctypes.c_int64(n),
        AtA.ctypes.data_as(pd), Atb.ctypes.data_as(pd),
        mass.ctypes.data_as(pd), out.ctypes.data_as(pd),
    )
    return out


def qef_accumulate_batch(vid, pt, nm, w, NV):
    """Native per-vertex QEF accumulation; None when unavailable.

    vid [E] int64, pt/nm [E,3] f64, w [E] bool -> [NV, 14] f64 with
    columns (msum xyz, count, AtA 00/01/02/11/12/22, Atb xyz, btb)."""
    lib = _load_mesh()
    if lib is None or not hasattr(lib, "fidget_qef_accumulate"):
        return None
    vid = np.ascontiguousarray(vid, np.int64)
    pt = np.ascontiguousarray(pt, np.float64)
    nm = np.ascontiguousarray(nm, np.float64)
    w = np.ascontiguousarray(w, np.uint8)
    E = len(vid)
    out = np.empty((NV, 14), np.float64)
    pd = ctypes.POINTER(ctypes.c_double)
    lib.fidget_qef_accumulate(
        ctypes.c_int64(E), ctypes.c_int64(NV),
        vid.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        pt.ctypes.data_as(pd), nm.ctypes.data_as(pd),
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(pd),
    )
    return out
