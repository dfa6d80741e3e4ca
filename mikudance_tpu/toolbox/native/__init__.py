"""ctypes loader for the native C++ kernels (built on first use, cached)."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libmsda.so")
_SRC = os.path.join(_DIR, "ms_deform_attn.cpp")

_lib = None


def _build() -> None:
    subprocess.run(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _SO, _SRC],
        check=True,
    )


def get_lib():
    global _lib
    if _lib is None:
        if (not os.path.exists(_SO)) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        ):
            _build()
        _lib = ctypes.CDLL(_SO)
        _lib.msda_forward.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ] + [ctypes.c_int64] * 7
        _lib.msda_forward.restype = None
    return _lib


def ms_deform_attn_cpu(value, spatial_shapes, sampling_locations, attention_weights):
    """numpy forward through the C++ kernel; mirrors toolbox.deformable.ms_deform_attn."""
    lib = get_lib()
    value = np.ascontiguousarray(value, np.float32)
    shapes = np.ascontiguousarray(np.asarray(spatial_shapes, np.int64))
    locs = np.ascontiguousarray(sampling_locations, np.float32)
    wts = np.ascontiguousarray(attention_weights, np.float32)
    B, S, H, D = value.shape
    L = shapes.shape[0]
    Q, P = locs.shape[1], locs.shape[4]
    out = np.zeros((B, Q, H * D), np.float32)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    lib.msda_forward(
        ptr(value, ctypes.c_float), ptr(shapes, ctypes.c_int64),
        ptr(locs, ctypes.c_float), ptr(wts, ctypes.c_float),
        ptr(out, ctypes.c_float),
        B, S, H, D, L, Q, P,
    )
    return out
