"""ctypes bindings to the native runtime components (native/*.cpp).

Two components, mirroring the native roles a production framework carries
around its device compute path:

* ``oracle_fields`` — the literal O(N⁴) FFTMesh.cs port in multithreaded C++
  (native/fftmesh_oracle.cpp). Independent of both the JAX solver and the
  factorized numpy oracle; used to cross-validate all three.
* ``AsyncExporter`` — background snapshot writer (native/exporter.cpp):
  submissions copy into a bounded ring and flush to .npy from a worker
  thread, keeping file IO off the step loop's critical path.

The shared library is built on demand with the checked-in Makefile; import
never fails — ``available()`` gates tests/benches when no toolchain exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtpuocean_native.so")

_lib = None
_lib_error: Optional[str] = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                       capture_output=True, timeout=300)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib, _lib_error
    if _lib is not None or _lib_error is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        _lib_error = "native library unavailable (no toolchain?)"
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:  # stale binary for another arch etc.
        _lib_error = str(e)
        return None

    d = ctypes.POINTER(ctypes.c_double)
    lib.fftmesh_oracle_fields.restype = None
    lib.fftmesh_oracle_fields.argtypes = (
        [ctypes.c_int64, ctypes.c_double, ctypes.c_double, ctypes.c_double,
         ctypes.c_double, ctypes.c_int64] + [d] * 12)

    lib.exporter_create.restype = ctypes.c_void_p
    lib.exporter_create.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.exporter_submit.restype = ctypes.c_int32
    lib.exporter_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.c_int64, d, ctypes.c_int64,
                                    ctypes.POINTER(ctypes.c_int64)]
    lib.exporter_pending.restype = ctypes.c_int64
    lib.exporter_pending.argtypes = [ctypes.c_void_p]
    lib.exporter_flush.restype = None
    lib.exporter_flush.argtypes = [ctypes.c_void_p]
    lib.exporter_destroy.restype = None
    lib.exporter_destroy.argtypes = [ctypes.c_void_p]
    lib.exporter_errors.restype = ctypes.c_int64
    lib.exporter_errors.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


# ------------------------------------------------------------------- oracle

def oracle_fields(n: int, length: float, unit_width: float, choppiness: float,
                  t: float, h0: np.ndarray, h0_conj: np.ndarray,
                  num_threads: int = 0):
    """Evaluate the literal FFTMesh.cs sum; returns a dict of [N, N] float64
    fields matching oracle.OracleFields' layout."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native oracle unavailable: {_lib_error}")
    h0 = np.ascontiguousarray(h0, dtype=np.complex128)
    h0c = np.ascontiguousarray(h0_conj, dtype=np.complex128)
    re = np.ascontiguousarray(h0.real)
    im = np.ascontiguousarray(h0.imag)
    cre = np.ascontiguousarray(h0c.real)
    cim = np.ascontiguousarray(h0c.imag)
    out = {name: np.empty((n, n), dtype=np.float64)
           for name in ("height", "disp_x", "disp_z", "pos_x", "pos_z",
                        "foam", "jacobian")}
    out["normal"] = np.empty((n, n, 3), dtype=np.float64)

    def ptr(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))

    lib.fftmesh_oracle_fields(
        n, length, unit_width, choppiness, t, num_threads,
        ptr(re), ptr(im), ptr(cre), ptr(cim),
        ptr(out["height"]), ptr(out["disp_x"]), ptr(out["disp_z"]),
        ptr(out["pos_x"]), ptr(out["pos_z"]), ptr(out["normal"]),
        ptr(out["foam"]), ptr(out["jacobian"]))
    return out


# ----------------------------------------------------------------- exporter

class AsyncExporter:
    """Non-blocking .npy snapshot writer backed by the native worker thread."""

    def __init__(self, directory: str, capacity_bytes: int = 256 << 20):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native exporter unavailable: {_lib_error}")
        os.makedirs(directory, exist_ok=True)
        self._lib = lib
        self._h = lib.exporter_create(directory.encode(), capacity_bytes)

    def submit(self, name: str, step: int, array) -> bool:
        """Queue one array for writing; returns False if the ring is full."""
        a = np.ascontiguousarray(np.asarray(array), dtype=np.float64)
        dims = (ctypes.c_int64 * a.ndim)(*a.shape)
        ok = self._lib.exporter_submit(
            self._h, name.encode(), step,
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), a.ndim, dims)
        return bool(ok)

    def pending(self) -> int:
        return int(self._lib.exporter_pending(self._h))

    def flush(self) -> None:
        self._lib.exporter_flush(self._h)

    def errors(self) -> int:
        """Failed opens/short writes/renames/truncated paths since
        creation; flush() + errors() == 0 guarantees every accepted
        submission is a complete .npy on disk (r5)."""
        return int(self._lib.exporter_errors(self._h))

    def close(self) -> None:
        if self._h is not None:
            self._lib.exporter_destroy(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
