"""ctypes binding for the native CSV parser (native/csvload.cc).

The shared library is built on first use with the system toolchain and
cached next to the source; everything degrades gracefully to the pure-Python
parser when no toolchain is available (the `Environment` contract: stub or
gate, never hard-require).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SRC = os.path.join(_NATIVE_DIR, "csvload.cc")
_LIB = os.path.join(_NATIVE_DIR, "libcsvload.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) and os.path.exists(_SRC):
            if not _build():
                return None
        if not os.path.exists(_LIB):
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        for name in ("csv_parse_buffer", "csv_load_file"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int
        lib.csv_parse_buffer.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.csv_load_file.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.csv_free.restype = None
        lib.csv_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
        _lib = lib
        return _lib


class CsvError(ValueError):
    def __init__(self, code: int, line: int):
        self.code = code
        self.line = line
        if code == -2 and line == 0:
            msg = "no data"  # bin/ocaml_gpr.ml:153
        else:
            msg = {
                -1: f"incompatible dimension of sample in line {line}",
                -2: f"failure converting sample in line {line}",
                -3: "out of memory or I/O failure",
            }.get(code, f"csv parse error {code}")
        super().__init__(msg)


def _collect(lib, rc, out, rows, cols, err_line) -> np.ndarray:
    if rc != 0:
        raise CsvError(rc, err_line.value)
    n, d = rows.value, cols.value
    try:
        arr = np.ctypeslib.as_array(out, shape=(n, d)).copy()
    finally:
        lib.csv_free(out)
    return arr


def parse_csv_bytes(data: bytes) -> np.ndarray | None:
    """(n, d) float64 array, or None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_double)()
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    err_line = ctypes.c_int64()
    rc = lib.csv_parse_buffer(data, len(data), ctypes.byref(out),
                              ctypes.byref(rows), ctypes.byref(cols),
                              ctypes.byref(err_line))
    return _collect(lib, rc, out, rows, cols, err_line)


def load_csv_file(path: str) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_double)()
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    err_line = ctypes.c_int64()
    rc = lib.csv_load_file(path.encode(), ctypes.byref(out),
                           ctypes.byref(rows), ctypes.byref(cols),
                           ctypes.byref(err_line))
    return _collect(lib, rc, out, rows, cols, err_line)
