"""ctypes bindings for the native audio IO library (native/audioio.cpp).

Builds lazily via ``make -C native`` on first use if the shared object is
missing (g++ is part of the baked-in toolchain)."""

from naturalspeech2_tpu.native.audioio import load, resample  # noqa: F401
