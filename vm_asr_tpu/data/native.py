"""ctypes bindings for the C++ host-DSP core (native/src/vm_asr_native.cpp).

The degradation pipeline's hot host ops — polyphase resampling and zero-phase
SOS filtering (reference data_loaders.py:309-347, 538-566) — as tight C++
loops. Falls back to scipy transparently when the shared library hasn't been
built (`native/build.sh`); `dsp.degrade` picks the fast path automatically.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "lib", "libvm_asr_native.so",
)


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    i16p = ctypes.POINTER(ctypes.c_int16)

    lib.vm_resample_poly_out_len.restype = ctypes.c_int64
    lib.vm_resample_poly_out_len.argtypes = [ctypes.c_int64, ctypes.c_int,
                                             ctypes.c_int]
    lib.vm_resample_poly.restype = ctypes.c_int64
    lib.vm_resample_poly.argtypes = [f32p, ctypes.c_int64, ctypes.c_int,
                                     ctypes.c_int, f32p]
    lib.vm_sosfiltfilt.restype = ctypes.c_int
    lib.vm_sosfiltfilt.argtypes = [f64p, ctypes.c_int, f32p, ctypes.c_int64,
                                   f32p]
    lib.vm_pcm16_to_f32.restype = None
    lib.vm_pcm16_to_f32.argtypes = [i16p, ctypes.c_int64, f32p]
    lib.vm_f32_to_pcm16.restype = None
    lib.vm_f32_to_pcm16.argtypes = [f32p, ctypes.c_int64, i16p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def resample_poly(x: np.ndarray, up: int, down: int) -> np.ndarray:
    """scipy.signal.resample_poly-compatible (1-D float32)."""
    lib = _load()
    assert lib is not None
    x = np.ascontiguousarray(x, np.float32)
    n_out = lib.vm_resample_poly_out_len(x.shape[-1], up, down)
    out = np.empty(int(n_out), np.float32)
    lib.vm_resample_poly(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.shape[-1],
        up, down, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def sosfiltfilt(sos: np.ndarray, x: np.ndarray) -> np.ndarray:
    """scipy.signal.sosfiltfilt-compatible (1-D float32, method='pad')."""
    lib = _load()
    assert lib is not None
    sos = np.ascontiguousarray(sos, np.float64)
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty_like(x)
    rc = lib.vm_sosfiltfilt(
        sos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), sos.shape[0],
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.shape[-1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise ValueError("input too short for sosfiltfilt padding")
    return out


def pcm16_to_f32(x: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None
    x = np.ascontiguousarray(x, np.int16)
    out = np.empty(x.shape, np.float32)
    lib.vm_pcm16_to_f32(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), x.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def f32_to_pcm16(x: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty(x.shape, np.int16)
    lib.vm_f32_to_pcm16(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
    )
    return out
