"""ctypes bindings for the native loader library (with Python fallback).

The reference's loaders are C++/TBB (`src/Loaders/*`); our hot parsing
paths (.obj tokenization, stress .dat float streams) are implemented in
`native/loaders.cpp`, built to `native/liblinevis_loaders.so` by
`native/build.sh` and auto-built on first import when a compiler is
available. All consumers fall back to pure Python if unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "liblinevis_loaders.so")

_lib = None


class _ObjResult(ctypes.Structure):
    _fields_ = [
        ("positions", ctypes.POINTER(ctypes.c_float)),
        ("attributes", ctypes.POINTER(ctypes.c_float)),
        ("line_offsets", ctypes.POINTER(ctypes.c_int64)),
        ("num_lines", ctypes.c_int64),
        ("total_points", ctypes.c_int64),
        ("num_attrs", ctypes.c_int64),
        ("attr_names", ctypes.c_char_p),
    ]


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        build = os.path.join(_REPO_ROOT, "native", "build.sh")
        try:
            subprocess.run(["sh", build], check=True, capture_output=True,
                           timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.lv_parse_floats.restype = ctypes.POINTER(ctypes.c_double)
    lib.lv_parse_floats.argtypes = [ctypes.c_char_p,
                                    ctypes.POINTER(ctypes.c_int64)]
    lib.lv_parse_obj.restype = ctypes.POINTER(_ObjResult)
    lib.lv_parse_obj.argtypes = [ctypes.c_char_p]
    lib.lv_free.argtypes = [ctypes.c_void_p]
    lib.lv_free_obj.argtypes = [ctypes.POINTER(_ObjResult)]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def parse_floats(path: str) -> Optional[np.ndarray]:
    """All whitespace-separated numbers in a file -> float64 array
    (non-numeric tokens skipped). None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    count = ctypes.c_int64()
    ptr = lib.lv_parse_floats(path.encode(), ctypes.byref(count))
    if not ptr:
        return None
    out = np.ctypeslib.as_array(ptr, shape=(count.value,)).copy()
    lib.lv_free(ptr)
    return out


def parse_obj(path: str) -> Optional[Tuple[List[np.ndarray], List[np.ndarray], List[str]]]:
    """Native .obj line-set parse -> (positions, attributes, names) in the
    RaggedTrajectories layout. None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    r = lib.lv_parse_obj(path.encode())
    if not r:
        return None
    res = r.contents
    tp = res.total_points
    na = res.num_attrs
    pos = np.ctypeslib.as_array(res.positions, shape=(tp * 3,)).copy().reshape(tp, 3)
    att = (
        np.ctypeslib.as_array(res.attributes, shape=(tp * na,)).copy().reshape(tp, na)
        if na
        else np.zeros((tp, 0), np.float32)
    )
    offs = np.ctypeslib.as_array(res.line_offsets, shape=(res.num_lines + 1,)).copy()
    names = res.attr_names.decode().split("\n") if res.attr_names else []
    names = [n for n in names if n]
    lib.lv_free_obj(r)
    positions = [pos[offs[i]: offs[i + 1]].astype(np.float32) for i in range(len(offs) - 1)]
    attributes = [
        att[offs[i]: offs[i + 1]].T.astype(np.float32) for i in range(len(offs) - 1)
    ]
    return positions, attributes, names
