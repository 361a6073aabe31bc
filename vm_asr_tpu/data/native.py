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

    if hasattr(lib, "vm_flac_decode"):  # absent in pre-flac builds of the .so
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32pp = ctypes.POINTER(ctypes.POINTER(ctypes.c_int32))
        ip = ctypes.POINTER(ctypes.c_int)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.vm_flac_decode.restype = ctypes.c_int
        lib.vm_flac_decode.argtypes = [u8p, ctypes.c_int64, i32pp, i64p,
                                       ip, ip, ip]
        lib.vm_flac_free.restype = None
        lib.vm_flac_free.argtypes = [ctypes.POINTER(ctypes.c_int32)]
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


def decode_flac(path_or_bytes) -> tuple:
    """Decode a FLAC file (native/src/flac_decoder.cpp).

    Returns (samples, sample_rate): samples float32 in [-1, 1), shape
    (channels, n_frames) — the layout torchaudio.load gives the reference's
    flac→wav conversion (data_loaders.py:151-246).
    """
    lib = _load()
    if lib is None or not hasattr(lib, "vm_flac_decode"):
        raise RuntimeError(
            "native FLAC decoder unavailable — (re)build it with "
            "native/build.sh"
        )
    if isinstance(path_or_bytes, (bytes, bytearray)):
        blob = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            blob = f.read()
    buf = np.frombuffer(blob, np.uint8)
    out = ctypes.POINTER(ctypes.c_int32)()
    n_frames = ctypes.c_int64()
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    bps = ctypes.c_int()
    rc = lib.vm_flac_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.size,
        ctypes.byref(out), ctypes.byref(n_frames), ctypes.byref(sr),
        ctypes.byref(ch), ctypes.byref(bps),
    )
    if rc != 0:
        raise ValueError(f"FLAC decode failed (code {rc})")
    n = int(n_frames.value) * int(ch.value)
    try:
        pcm = np.ctypeslib.as_array(out, shape=(n,)).copy()
    finally:
        lib.vm_flac_free(out)
    # interleaved → (channels, frames); normalise by the sample depth
    audio = pcm.reshape(int(n_frames.value), int(ch.value)).T
    scale = float(1 << (int(bps.value) - 1))
    return (audio.astype(np.float32) / scale, int(sr.value))


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
