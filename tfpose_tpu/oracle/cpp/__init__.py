"""ctypes binding for the native C++ parity decoder.

The reference ships its decoder as C++ via SWIG
(``tf_pose/pafprocess``); ours is a C-ABI shared library built lazily
with g++ and loaded with ctypes (no SWIG/pybind needed). Used by tests
as a second, native parity anchor next to the NumPy oracle.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "pafdecode.cpp")
_LIB = os.path.join(_DIR, "libpafdecode.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
        check=True, capture_output=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_LIB)
    lib.process_paf.restype = ctypes.c_int
    lib.process_paf.argtypes = [
        ctypes.POINTER(ctypes.c_float),  # peaks
        ctypes.POINTER(ctypes.c_float),  # heat
        ctypes.POINTER(ctypes.c_float),  # paf
        ctypes.c_int, ctypes.c_int,      # h, w
        ctypes.POINTER(ctypes.c_float),  # out_parts
        ctypes.POINTER(ctypes.c_float),  # out_scores
        ctypes.c_int,                    # max_humans
        ctypes.c_float, ctypes.c_float, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_int,
    ]
    _lib = lib
    return lib


def process_paf(peaks: np.ndarray, heat: np.ndarray, paf: np.ndarray,
                max_humans: int = 96, thresh_heat: float = 0.05,
                thresh_vector_score: float = 0.05,
                thresh_vector_cnt1: int = 8, thresh_part_cnt: int = 4,
                thresh_human_score: float = 0.4, step_paf: int = 10):
    """Native decode. Returns (parts (n, 18, 4), scores (n,))."""
    lib = get_lib()
    h, w, _ = peaks.shape
    peaks_f = np.ascontiguousarray(peaks, np.float32)
    heat_f = np.ascontiguousarray(heat, np.float32)
    paf_f = np.ascontiguousarray(paf, np.float32)
    out_parts = np.full((max_humans, 18, 4), -1.0, np.float32)
    out_scores = np.zeros((max_humans,), np.float32)

    def ptr(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    n = lib.process_paf(ptr(peaks_f), ptr(heat_f), ptr(paf_f), h, w,
                        ptr(out_parts), ptr(out_scores), max_humans,
                        thresh_heat, thresh_vector_score,
                        thresh_vector_cnt1, thresh_part_cnt,
                        thresh_human_score, step_paf)
    return out_parts[:n], out_scores[:n]
