"""ctypes binding for the native CSV reader (csrc/fastcsv.cpp).

Loads ``libfastcsv.so`` if present (or buildable with the in-image g++)
and exposes ``read_csv(path) -> float64 ndarray``; callers fall back to
pandas when the native path is unavailable.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_CSRC = Path(__file__).parent.parent.parent / "csrc"
_LIB_PATH = _CSRC / "libfastcsv.so"
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and (_CSRC / "fastcsv.cpp").exists():
        try:
            subprocess.run(
                ["make", "-C", str(_CSRC)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.fastcsv_dims.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_long),
        ]
        lib.fastcsv_dims.restype = ctypes.c_int
        lib.fastcsv_read.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_long,
            ctypes.c_long,
        ]
        lib.fastcsv_read.restype = ctypes.c_long
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def read_csv(path) -> np.ndarray:
    """Parse a headered numeric CSV to a row-major float64 array."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libfastcsv unavailable")
    rows = ctypes.c_long()
    cols = ctypes.c_long()
    rc = lib.fastcsv_dims(str(path).encode(), ctypes.byref(rows), ctypes.byref(cols))
    if rc != 0:
        raise IOError(f"fastcsv_dims failed for {path}")
    out = np.empty((rows.value, cols.value), dtype=np.float64)
    got = lib.fastcsv_read(
        str(path).encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rows.value,
        cols.value,
    )
    if got < 0:
        raise ValueError(
            f"fastcsv: unparseable (non-numeric) cell in {path}; "
            "caller should use the strict pandas path"
        )
    if got != rows.value:
        raise IOError(f"fastcsv_read parsed {got}/{rows.value} rows of {path}")
    return out
