# native.py — ctypes loader for the optional C++ host-data engine.
#
# The reference is pure Python (SURVEY.md §2: "no native component anywhere");
# this rebuild adds a small C++ library for the host-side hot paths (ellipse
# rasterization, stripe-shuffle index generation, patch extraction) so the
# input pipeline keeps TPU steps fed. Built by runtime/build_native.sh into
# libspcct_data.so; every caller has a numpy fallback with identical output,
# so the library is an accelerator, not a dependency.
from __future__ import annotations

import ctypes
import os
from pathlib import Path

import numpy as np

_LIB_PATH = Path(__file__).with_name("libspcct_data.so")

lib = None
if _LIB_PATH.exists() and os.getenv("SPCCT_DISABLE_NATIVE", "0") != "1":
    try:
        _raw = ctypes.CDLL(str(_LIB_PATH))
        _raw.paint_ellipses.argtypes = [
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),  # out (H,W)
            ctypes.c_int, ctypes.c_int,                              # H, W
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),  # rois (N,5)
            ctypes.c_int,                                            # N
        ]
        _raw.paint_ellipses.restype = None

        _raw.stamp_and_noise.argtypes = [
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_uint64,
        ]
        _raw.stamp_and_noise.restype = None
        lib = _raw
    except OSError:
        lib = None
