"""ctypes binding for the native numeric-table IO (native/fastio.cpp).

Compiled lazily with the system C++ toolchain on first use (g++ -O3 -shared);
if no compiler is available, or a table has non-numeric columns, callers fall
back to pandas transparently.  Used on the chain-file hot path: mcmc output
(all-float tables with n_obs+8 columns) and select/predict chain input.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import tempfile
from typing import List, Optional, Tuple

import numpy as np

log = logging.getLogger("gaplac")

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_SRC = os.path.join(_NATIVE_DIR, "fastio.cpp")
_SO = os.path.join(_NATIVE_DIR, "_fastio.so")

_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build() -> bool:
    cxx = os.environ.get("CXX", "g++")
    cmd = [cxx, "-O3", "-shared", "-fPIC", "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError, PermissionError) as e:
        log.debug("fastio native build failed (%s); using pandas", e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _lib_failed = True
                return None
        lib = ctypes.CDLL(_SO)
        lib.fastio_read.restype = ctypes.c_int
        lib.fastio_read.argtypes = [
            ctypes.c_char_p, ctypes.c_char,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_char_p),
        ]
        lib.fastio_write.restype = ctypes.c_int
        lib.fastio_write.argtypes = [
            ctypes.c_char_p, ctypes.c_char, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_long,
        ]
        lib.fastio_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
        lib.fastio_free_str.argtypes = [ctypes.c_char_p]
        _lib = lib
    except OSError as e:
        log.debug("fastio load failed (%s); using pandas", e)
        _lib_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def read_numeric(path: str, delim: str) -> Optional[Tuple[List[str], np.ndarray]]:
    """(column_names, (rows, cols) float array), or None when the native
    path is unavailable or the table has non-numeric fields."""
    lib = _load()
    if lib is None:
        return None
    data_p = ctypes.POINTER(ctypes.c_double)()
    rows = ctypes.c_long()
    cols = ctypes.c_long()
    header_p = ctypes.c_char_p()
    rc = lib.fastio_read(
        path.encode(), delim.encode(), ctypes.byref(data_p),
        ctypes.byref(rows), ctypes.byref(cols), ctypes.byref(header_p),
    )
    if rc != 0:
        return None
    try:
        n = rows.value * cols.value
        arr = np.ctypeslib.as_array(data_p, shape=(rows.value, cols.value)).copy()
        header = header_p.value.decode("utf-8", "replace")
    finally:
        lib.fastio_free(data_p)
        # header_p was malloc'd by C; ctypes c_char_p already copied the bytes
        # into header via .value, but the C buffer itself must be released
        # through the library to avoid allocator mismatch
        lib.fastio_free_str(header_p)
    # strip surrounding quotes (R's write.csv default quotes header names;
    # the pandas fallback unquotes them, so the fast path must match)
    names = [n.strip().strip('"').strip("'") for n in header.split(delim)]
    if len(names) != cols.value:
        return None
    return names, arr


def write_numeric(path: str, delim: str, names: List[str], data: np.ndarray) -> bool:
    """Write a float table; returns False if the native path is unavailable."""
    lib = _load()
    if lib is None:
        return False
    data = np.ascontiguousarray(data, dtype=np.float64)
    header = delim.join(names).encode()
    rc = lib.fastio_write(
        path.encode(), delim.encode(), header,
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        data.shape[0], data.shape[1],
    )
    return rc == 0
