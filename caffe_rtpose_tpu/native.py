"""ctypes bindings for the native host runtime (native/pose_host.cpp).

The shared library is built on demand with g++ (no pip deps); if the
toolchain is unavailable the callers fall back to the pure-Python
implementation in pose.connect.assemble.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_ROOT, "native", "pose_host.cpp")
_LIB = os.path.join(_ROOT, "native", "libpose_host.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_generic_libs: dict = {}


def load_lib(name: str, extra_flags: tuple = ()) -> Optional[ctypes.CDLL]:
    """Build (if stale) + load native/<name>.cpp as lib<name>.so.  Returns
    None when the toolchain is unavailable; callers fall back to Python.
    extra_flags: additional compile/link arguments (e.g. OpenCV includes
    and libs for cvwarp.cpp)."""
    with _lock:
        if name in _generic_libs:
            return _generic_libs[name]
        src = os.path.join(_ROOT, "native", f"{name}.cpp")
        lib_path = os.path.join(_ROOT, "native", f"lib{name}.so")
        lib = None
        try:
            have_src = os.path.exists(src)
            stale = have_src and (
                not os.path.exists(lib_path)
                or os.path.getmtime(lib_path) < os.path.getmtime(src)
            )
            if stale:
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src,
                     "-o", lib_path, *extra_flags],
                    check=True, capture_output=True,
                )
            # a prebuilt lib without its source (stripped install) still loads
            lib = ctypes.CDLL(lib_path)
        except Exception:
            lib = None
        _generic_libs[name] = lib
        return lib


def load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
    lib = load_lib("pose_host")  # shared compile-and-load path
    if lib is None:
        return None
    lib.crt_assemble.restype = ctypes.c_int
    lib.crt_assemble.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    with _lock:
        _lib = lib
    return lib


def assemble_native(peaks, pair_score, pair_count, desc, params, scale_xy=(1.0, 1.0),
                    max_people: int = 96):
    """Native greedy assembly; returns (joints (n, parts, 3), num_people) or
    None when the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    peaks = np.ascontiguousarray(peaks, np.float32)
    pair_score = np.ascontiguousarray(pair_score, np.float32)
    pair_count = np.ascontiguousarray(pair_count, np.int32)
    limb_seq = np.ascontiguousarray(desc.limb_sequence, dtype=np.int32)
    num_parts = desc.num_parts
    max_peaks = peaks.shape[1] - 1
    joints = np.zeros((max_people, num_parts, 3), np.float32)
    n = lib.crt_assemble(
        peaks.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_parts, max_peaks,
        pair_score.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pair_count.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        limb_seq.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), desc.num_limbs,
        params.min_subset_cnt, params.min_subset_score,
        params.inter_min_above_threshold,
        1 if desc.clamp_samples else 0,
        float(scale_xy[0]), float(scale_xy[1]),
        joints.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_people,
    )
    return joints[:n].copy(), n
