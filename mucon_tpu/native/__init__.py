"""Native (C++) host-runtime kernels, loaded via ctypes.

Compiled on first import with g++ (cached by source mtime); every consumer
falls back to the pure-Python implementation when the toolchain is missing,
so the framework never hard-depends on a compiler at runtime.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(__file__).parent
_SRC = _DIR / "metrics.cpp"
_LIB = _DIR / "_libmetrics.so"

_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        if _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
            return True
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             str(_SRC), "-o", str(_LIB)],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError, OSError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("MUCON_TPU_NO_NATIVE"):
        return None
    if not _build():
        return None
    lib = ctypes.CDLL(str(_LIB))
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.overlap_score.restype = ctypes.c_double
    lib.overlap_score.argtypes = [
        i64p, i64p, ctypes.c_int, i64p, ctypes.c_int, ctypes.c_int,
    ]
    lib.levenshtein.restype = ctypes.c_double
    lib.levenshtein.argtypes = [i64p, ctypes.c_int, i64p, ctypes.c_int]
    lib.levenshtein_matches.restype = None
    lib.levenshtein_matches.argtypes = [
        i64p, ctypes.c_int, i64p, ctypes.c_int, i64p, i64p,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _as_i64(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x, dtype=np.int64))


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def overlap_score_native(prediction, target, ignore_ids, union_denominator: bool):
    lib = _load()
    if lib is None:
        return None
    p, t = _as_i64(prediction), _as_i64(target)
    ig = _as_i64(list(ignore_ids))
    return lib.overlap_score(
        _ptr(p), _ptr(t), len(t), _ptr(ig), len(ig), int(union_denominator)
    )


def levenshtein_native(a, b):
    lib = _load()
    if lib is None:
        return None
    aa, bb = _as_i64(a), _as_i64(b)
    return lib.levenshtein(_ptr(aa), len(aa), _ptr(bb), len(bb))


def levenshtein_matches_native(a, b):
    lib = _load()
    if lib is None:
        return None
    aa, bb = _as_i64(a), _as_i64(b)
    dist = np.zeros(1, np.int64)
    matches = np.zeros(1, np.int64)
    lib.levenshtein_matches(
        _ptr(aa), len(aa), _ptr(bb), len(bb), _ptr(dist), _ptr(matches)
    )
    return int(dist[0]), int(matches[0])
