"""Native (C++) host-runtime kernels, loaded via ctypes.

Compiled on first import with g++ (cached by source mtime); every consumer
falls back to the pure-Python implementation when the toolchain is missing,
so the framework never hard-depends on a compiler at runtime.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(__file__).parent
_SRCS = [_DIR / "metrics.cpp", _DIR / "collate.cpp"]
_LIB = _DIR / "_libnative.so"

_lib: Optional[ctypes.CDLL] = None
_build_failed = False  # cache failure: never retry the g++ spawn per call
# _load is called from the loader's prefetch thread (collate) AND the main
# thread (metrics); the build must be serialized and the .so written
# atomically or CDLL can map a half-written library
_lock = threading.Lock()


def _build() -> bool:
    try:
        newest_src = max(s.stat().st_mtime for s in _SRCS)
        if _LIB.exists() and _LIB.stat().st_mtime >= newest_src:
            return True
        tmp = _LIB.with_suffix(f".so.tmp.{os.getpid()}")
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17"]
            + [str(s) for s in _SRCS]
            + ["-o", str(tmp)],
            check=True,
            capture_output=True,
        )
        tmp.rename(_LIB)  # atomic: concurrent processes race benignly
        return True
    except (subprocess.CalledProcessError, FileNotFoundError, OSError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if _build_failed or os.environ.get("MUCON_TPU_NO_NATIVE"):
        return None
    with _lock:
        return _load_locked()


def _load_locked() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:  # another thread won the race
        return _lib
    if _build_failed:
        return None
    if not _build():
        _build_failed = True
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
    dp = ctypes.POINTER(ctypes.c_double)
    lib.f_scores_multi.restype = None
    lib.f_scores_multi.argtypes = [
        i64p, i64p, ctypes.c_int, i64p, ctypes.c_int, dp, ctypes.c_int, dp,
    ]
    lib.edit_score_norm.restype = ctypes.c_double
    lib.edit_score_norm.argtypes = [
        i64p, i64p, ctypes.c_int, i64p, ctypes.c_int,
    ]
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.pad_copy_f32.restype = None
    lib.pad_copy_f32.argtypes = [
        f32p, ctypes.POINTER(f32p), i64p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
    ]
    lib.pad_copy_i64_to_i32.restype = None
    lib.pad_copy_i64_to_i32.argtypes = [
        i32p, ctypes.POINTER(i64p), i64p,
        ctypes.c_int64, ctypes.c_int64,
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


def pad_copy_feats_native(dst: np.ndarray, feats_list) -> bool:
    """Copy per-video [T_i x D] float32 features into zeroed dst
    [B x Tpad x D] with the GIL released.  Returns False if the native lib
    is unavailable or dtypes/layouts don't match (caller falls back)."""
    lib = _load()
    if lib is None or dst.dtype != np.float32 or not dst.flags.c_contiguous:
        return False
    if any(
        f.dtype != np.float32 or not f.flags.c_contiguous or f.ndim != 2
        for f in feats_list
    ):
        return False
    B, Tpad, D = dst.shape
    if any(f.shape[1] != D or f.shape[0] > Tpad for f in feats_list):
        return False
    f32p = ctypes.POINTER(ctypes.c_float)
    srcs = (f32p * B)(*[f.ctypes.data_as(f32p) for f in feats_list])
    lens = np.array([f.shape[0] for f in feats_list], np.int64)
    lib.pad_copy_f32(
        dst.ctypes.data_as(f32p), srcs, _ptr(lens), B, Tpad, D
    )
    return True


def pad_copy_labels_native(dst: np.ndarray, labels_list) -> bool:
    """Copy per-video int64 label vectors into zeroed int32 dst [B x Tpad]."""
    lib = _load()
    if lib is None or dst.dtype != np.int32 or not dst.flags.c_contiguous:
        return False
    if any(
        l.dtype != np.int64 or not l.flags.c_contiguous or l.ndim != 1
        for l in labels_list
    ):
        return False
    B, Tpad = dst.shape
    if any(l.shape[0] > Tpad for l in labels_list):
        return False
    i64pp = ctypes.POINTER(ctypes.c_int64)
    srcs = (i64pp * B)(*[l.ctypes.data_as(i64pp) for l in labels_list])
    lens = np.array([l.shape[0] for l in labels_list], np.int64)
    lib.pad_copy_i64_to_i32(
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), srcs,
        _ptr(lens), B, Tpad
    )
    return True


def f_scores_multi_native(prediction, target, overlaps, bg_class):
    """(tp, fp, fn) per IoU threshold in one native call, or None."""
    lib = _load()
    if lib is None:
        return None
    p, t = _as_i64(prediction), _as_i64(target)
    if len(p) != len(t):
        return None
    bg = _as_i64(list(bg_class))
    ovl = np.ascontiguousarray(np.asarray(overlaps, np.float64))
    out = np.zeros((len(ovl), 3), np.float64)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.f_scores_multi(
        _ptr(p), _ptr(t), len(t), _ptr(bg), len(bg),
        ovl.ctypes.data_as(dp), len(ovl), out.ctypes.data_as(dp),
    )
    return out


def edit_score_norm_native(prediction, target, bg_class):
    lib = _load()
    if lib is None:
        return None
    p, t = _as_i64(prediction), _as_i64(target)
    if len(p) != len(t):
        return None
    bg = _as_i64(list(bg_class))
    return lib.edit_score_norm(_ptr(p), _ptr(t), len(t), _ptr(bg), len(bg))
