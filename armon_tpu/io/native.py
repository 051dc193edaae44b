"""ctypes bridge to the native I/O library (armon_tpu/native/armon_io.cc).

The native tier is auto-built on first use with the in-image toolchain and
falls back to the pure-Python implementation in `armon_tpu.io.output` when
unavailable. Byte-identical output format (C printf) — verified by the
roundtrip tests.
"""

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False
_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_DIR, "libarmon_io.so")
    # Always invoke make (a no-op when fresh): the Makefile tracks the
    # armon_io.cc dependency, so source edits rebuild instead of silently
    # loading a stale committed .so. Only a FAILED build with no prior
    # library disables the native tier.
    try:
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True, timeout=120)
    except Exception:
        if not os.path.exists(so):
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None

    lib.armon_write_cells.restype = ctypes.c_int
    lib.armon_write_cells.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_void_p), ctypes.c_long,
        ctypes.c_long, ctypes.c_long, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p]
    lib.armon_read_cells.restype = ctypes.c_long
    lib.armon_read_cells.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_double), ctypes.c_long,
        ctypes.c_long]
    lib.armon_read_window.restype = ctypes.c_long
    lib.armon_read_window.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_double), ctypes.c_long,
        ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.c_long, ctypes.c_long]
    lib.armon_count_differences.restype = ctypes.c_long
    lib.armon_count_differences.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_long, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double)]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def write_cells(path, arrays, precision, for_3d=True, header=None) -> bool:
    """Write row-major (rows, cols) arrays as the pm3d CSV. Returns False if
    the native library is unavailable (caller falls back to Python)."""
    lib = _load()
    if lib is None:
        return False
    arrs = [np.ascontiguousarray(a, dtype=np.float64) for a in arrays]
    rows, cols = arrs[0].shape
    if any(a.shape != (rows, cols) for a in arrs[1:]):
        raise ValueError("write_cells: mismatched variable shapes "
                         f"{[a.shape for a in arrs]}")
    ptrs = (ctypes.c_void_p * len(arrs))(
        *[a.ctypes.data_as(ctypes.c_void_p).value for a in arrs])
    rc = lib.armon_write_cells(
        str(path).encode(), ptrs, len(arrs), rows, cols, int(precision),
        1 if for_3d else 0, (header or "").encode())
    if rc != 0:
        raise IOError(f"native write failed ({rc}) for {path}")
    return True


def read_cells(path, expected_vals, skip_lines=0):
    """Read up to `expected_vals` doubles. Returns a float64 array or None
    when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty(expected_vals, np.float64)
    n = lib.armon_read_cells(str(path).encode(),
                             out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                             expected_vals, skip_lines)
    if n < 0:
        raise IOError(f"native read failed ({n}) for {path}")
    return out[:n]


def read_window(path, nvars, gnx, row0, col0, hy, wx, skip_lines=0):
    """Stream a global-domain CSV and return only the (hy*wx, nvars)
    cell-major window (native tier of
    `io/subdomain.read_global_file_window`). Returns None when the native
    library is unavailable; raises on a short line. UNDERFILL (truncated
    file / layout mismatch) is returned as (array, filled) for the caller
    to diagnose with its own context."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((hy * wx, nvars), np.float64)
    n = lib.armon_read_window(
        str(path).encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        nvars, gnx, row0, col0, hy, wx, skip_lines)
    if n < 0:
        raise IOError(f"native window read failed ({n}) for {path}")
    return out, int(n)


def count_differences(ref, ours, atol, rtol):
    """(count, max_rel) with Julia isapprox semantics; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    if np.shape(ref) != np.shape(ours):
        # The C loop reads ours[i] for i < ref.size: a size mismatch would
        # be an out-of-bounds read, and a same-size shape mismatch a
        # silent misaligned compare (the numpy fallback would raise).
        raise ValueError(f"count_differences: shape mismatch "
                         f"{np.shape(ref)} vs {np.shape(ours)}")
    a = np.ascontiguousarray(ref, np.float64).ravel()
    b = np.ascontiguousarray(ours, np.float64).ravel()
    mr = ctypes.c_double(0.0)
    cnt = lib.armon_count_differences(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        a.size, float(atol), float(rtol), ctypes.byref(mr))
    return int(cnt), float(mr.value)
