"""ctypes wrapper over native/audioio.cpp (WAV+FLAC decode, sinc resample)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = Path(__file__).parent / "libaudioio.so"
_NATIVE_SRC = Path(__file__).parents[2] / "native"
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_SRC)],
            check=True,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def _load_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not _build():
        raise RuntimeError(
            "libaudioio.so not built; run `make -C native` in the repo root"
        )
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.audio_load.restype = ctypes.c_int
    lib.audio_load.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.audio_resample.restype = ctypes.c_int
    lib.audio_resample.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.audio_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return lib


def load(path: str) -> Tuple[np.ndarray, int]:
    """Decode WAV/FLAC → (float32 mono [-1, 1], sample_rate)."""
    lib = _load_lib()
    samples = ctypes.POINTER(ctypes.c_float)()
    length = ctypes.c_int64()
    sr = ctypes.c_int()
    rc = lib.audio_load(
        os.fsencode(path), ctypes.byref(samples), ctypes.byref(length),
        ctypes.byref(sr),
    )
    if rc != 0:
        raise ValueError(f"audio_load({path!r}) failed with code {rc}")
    try:
        out = np.ctypeslib.as_array(samples, shape=(length.value,)).copy()
    finally:
        lib.audio_free(samples)
    return out, sr.value


def resample(audio: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Windowed-sinc resampling (native)."""
    lib = _load_lib()
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    out = ctypes.POINTER(ctypes.c_float)()
    out_len = ctypes.c_int64()
    rc = lib.audio_resample(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(audio), sr_in, sr_out, ctypes.byref(out), ctypes.byref(out_len),
    )
    if rc != 0:
        raise ValueError(f"audio_resample failed with code {rc}")
    try:
        result = np.ctypeslib.as_array(out, shape=(out_len.value,)).copy()
    finally:
        lib.audio_free(out)
    return result
