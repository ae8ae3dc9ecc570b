"""ctypes bindings to the native C++ reference (csrc/qsim_ref.cpp).

Auto-builds ``csrc/libqsimref.so`` with the repo Makefile on first use.
Exposes the same capabilities as ref/cpu.py (parse, simulate, sample) with
OpenMP-parallel hot loops — used as a second, independent ground truth and
as a fast parser for very large circuit files.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

from ..ir.circuit import Circuit

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc")
_SO = os.path.join(_CSRC, "libqsimref.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


class NativeUnavailable(RuntimeError):
    pass


def _build() -> None:
    try:
        subprocess.run(
            ["make", "-C", _CSRC],
            check=True,
            capture_output=True,
            text=True,
        )
    except (subprocess.CalledProcessError, FileNotFoundError) as exc:
        detail = getattr(exc, "stderr", "") or str(exc)
        raise NativeUnavailable(f"cannot build libqsimref.so: {detail}") from exc


def get_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        src = os.path.join(_CSRC, "qsim_ref.cpp")
        if not os.path.exists(_SO) or (
            os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(_SO)
        ):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.qsr_error.restype = ctypes.c_char_p
        lib.qsr_parse_file.restype = ctypes.c_void_p
        lib.qsr_parse_file.argtypes = [ctypes.c_char_p]
        lib.qsr_parse_string.restype = ctypes.c_void_p
        lib.qsr_parse_string.argtypes = [ctypes.c_char_p]
        lib.qsr_num_qubits.argtypes = [ctypes.c_void_p]
        lib.qsr_num_gates.restype = ctypes.c_int64
        lib.qsr_num_gates.argtypes = [ctypes.c_void_p]
        lib.qsr_gates.argtypes = [ctypes.c_void_p] + [
            np.ctypeslib.ndpointer(dtype=np.float64),
            np.ctypeslib.ndpointer(dtype=np.float64),
            np.ctypeslib.ndpointer(dtype=np.int32),
            np.ctypeslib.ndpointer(dtype=np.int32),
            np.ctypeslib.ndpointer(dtype=np.int32),
            np.ctypeslib.ndpointer(dtype=np.float64),
        ]
        lib.qsr_free.argtypes = [ctypes.c_void_p]
        lib.qsr_simulate.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(dtype=np.float64),
            np.ctypeslib.ndpointer(dtype=np.float64),
        ]
        lib.qsr_sample.argtypes = [
            np.ctypeslib.ndpointer(dtype=np.float64),
            np.ctypeslib.ndpointer(dtype=np.float64),
            ctypes.c_int,
            ctypes.c_uint64,
            np.ctypeslib.ndpointer(dtype=np.int64),
            ctypes.c_int64,
        ]
        _lib = lib
        return lib


def available() -> bool:
    try:
        get_lib()
        return True
    except NativeUnavailable:
        return False


class _Handle:
    def __init__(self, lib, ptr):
        self._lib, self._ptr = lib, ptr

    def __del__(self):
        if getattr(self, "_ptr", None):
            self._lib.qsr_free(self._ptr)
            self._ptr = None


def _parse(lib, path: Optional[str] = None, text: Optional[str] = None) -> _Handle:
    if path is not None:
        ptr = lib.qsr_parse_file(path.encode())
    else:
        ptr = lib.qsr_parse_string(text.encode())
    if not ptr:
        raise ValueError(lib.qsr_error().decode())
    return _Handle(lib, ptr)


def parse_qasm_native(source: str, *, is_path: bool = False) -> Circuit:
    """Parse QASM with the native parser; returns the same Circuit IR."""
    lib = get_lib()
    h = _parse(lib, path=source if is_path else None, text=None if is_path else source)
    n = lib.qsr_num_qubits(h._ptr)
    m = int(lib.qsr_num_gates(h._ptr))
    u_re = np.empty((m, 4), dtype=np.float64)
    u_im = np.empty((m, 4), dtype=np.float64)
    target = np.empty(m, dtype=np.int32)
    control = np.empty(m, dtype=np.int32)
    opcode = np.empty(m, dtype=np.int32)
    param = np.empty(m, dtype=np.float64)
    lib.qsr_gates(h._ptr, u_re, u_im, target, control, opcode, param)

    circ = Circuit(n)
    for g in range(m):
        name = _OPCODES[opcode[g]]
        if name == "cx":
            circ.append("cx", int(control[g]), int(target[g]))
        elif name == "rz":
            circ.append("rz", int(target[g]), params=(float(param[g]),))
        else:
            circ.append(name, int(target[g]))
    return circ


# Must match enum Opcode in csrc/qsim_ref.cpp.
_OPCODES = ("cx", "id", "x", "sx", "z", "s", "sdg", "t", "tdg", "rz", "h")


def simulate_native(circuit_or_path, num_qubits: Optional[int] = None) -> np.ndarray:
    """Run the native f64 simulator; accepts a Circuit or a .qasm path."""
    lib = get_lib()
    if isinstance(circuit_or_path, str):
        h = _parse(lib, path=circuit_or_path)
    else:
        h = _parse(lib, text=circuit_or_path.to_qasm())
    n = lib.qsr_num_qubits(h._ptr)
    size = 1 << n
    out_re = np.empty(size, dtype=np.float64)
    out_im = np.empty(size, dtype=np.float64)
    rc = lib.qsr_simulate(h._ptr, out_re, out_im)
    if rc != 0:
        raise RuntimeError(lib.qsr_error().decode())
    return out_re + 1j * out_im


def sample_native(state: np.ndarray, num_samples: int, seed: int = 0) -> np.ndarray:
    lib = get_lib()
    n = int(np.log2(len(state)))
    out = np.empty(num_samples, dtype=np.int64)
    lib.qsr_sample(
        np.ascontiguousarray(state.real, dtype=np.float64),
        np.ascontiguousarray(state.imag, dtype=np.float64),
        n,
        seed,
        out,
        num_samples,
    )
    return out
