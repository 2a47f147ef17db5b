"""ctypes bindings for the native C++ runtime (TFRecord reader, FLAC decoder).

Builds the runtime/ shared libraries on first use if missing (g++ is
available in the target environment); falls back to the pure-Python
implementations when the build or load fails, so the pipeline always works.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_RUNTIME_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "runtime")
_LIB_PATH = os.path.join(_RUNTIME_DIR, "libtfrec.so")

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _load_lib():
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if not os.path.isfile(_LIB_PATH):
                subprocess.run(["make", "-C", _RUNTIME_DIR], check=True,
                               capture_output=True)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.sf_load.restype = ctypes.c_void_p
            lib.sf_load.argtypes = [ctypes.c_char_p, ctypes.c_int64]
            lib.sf_num_utts.restype = ctypes.c_int64
            lib.sf_num_utts.argtypes = [ctypes.c_void_p]
            lib.sf_utt_dims.restype = None
            lib.sf_utt_dims.argtypes = [ctypes.c_void_p, ctypes.c_int64] + \
                [ctypes.POINTER(ctypes.c_int64)] * 5
            lib.sf_utt_copy.restype = None
            lib.sf_utt_copy.argtypes = [
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64), ctypes.c_char_p]
            lib.sf_free.restype = None
            lib.sf_free.argtypes = [ctypes.c_void_p]
            _lib = lib
        except (OSError, subprocess.CalledProcessError):
            _lib_failed = True
        return _lib


def available() -> bool:
    return _load_lib() is not None


_FLAC_LIB_PATH = os.path.join(_RUNTIME_DIR, "libflacdec.so")
_flac_lib = None
_flac_failed = False


def _load_flac_lib():
    global _flac_lib, _flac_failed
    with _lock:
        if _flac_lib is not None or _flac_failed:
            return _flac_lib
        try:
            if not os.path.isfile(_FLAC_LIB_PATH):
                subprocess.run(["make", "-C", _RUNTIME_DIR], check=True,
                               capture_output=True)
            lib = ctypes.CDLL(_FLAC_LIB_PATH)
            lib.flac_open.restype = ctypes.c_void_p
            lib.flac_open.argtypes = [ctypes.c_char_p, ctypes.c_int64]
            lib.flac_info.restype = None
            lib.flac_info.argtypes = [ctypes.c_void_p] + \
                [ctypes.POINTER(ctypes.c_int64)] * 4
            lib.flac_copy.restype = None
            lib.flac_copy.argtypes = [ctypes.c_void_p,
                                      ctypes.POINTER(ctypes.c_int32)]
            lib.flac_close.restype = None
            lib.flac_close.argtypes = [ctypes.c_void_p]
            _flac_lib = lib
        except (OSError, subprocess.CalledProcessError):
            _flac_failed = True
        return _flac_lib


def decode_flac_bytes(data: bytes):
    """Decode a FLAC stream natively (runtime/flac_decoder.cc).

    Returns (samples [n, channels] int32, sample_rate, bits_per_sample) or
    None when the native library is unavailable or the stream is malformed
    (callers fall back to the pure-Python decoder, data/flac.py)."""
    lib = _load_flac_lib()
    if lib is None:
        return None
    handle = lib.flac_open(data, len(data))
    if not handle:
        return None
    try:
        dims = [ctypes.c_int64() for _ in range(4)]
        lib.flac_info(handle, *[ctypes.byref(d) for d in dims])
        n, channels, rate, bps = [d.value for d in dims]
        out = np.empty((n, channels), np.int32)
        if n:
            lib.flac_copy(handle,
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out, int(rate), int(bps)
    finally:
        lib.flac_close(handle)


def load_speech_file(path: str, feat_length: int):
    """Parse a TFRecord file of SequenceExamples natively.

    Returns a list of (utt_id, logmel [T,F] f32, cint int64, pint int64)
    or None when the native library is unavailable / the file is malformed.
    """
    lib = _load_lib()
    if lib is None:
        return None
    handle = lib.sf_load(path.encode(), feat_length)
    if not handle:
        return None
    try:
        n = lib.sf_num_utts(handle)
        out = []
        dims = [ctypes.c_int64() for _ in range(5)]
        for i in range(n):
            lib.sf_utt_dims(handle, i, *[ctypes.byref(d) for d in dims])
            frames, feat, n_char, n_phone, id_len = [d.value for d in dims]
            logmel = np.empty((frames, feat), np.float32)
            cint = np.empty((n_char,), np.int64)
            pint = np.empty((n_phone,), np.int64)
            utt_id = ctypes.create_string_buffer(max(id_len, 1))
            lib.sf_utt_copy(
                handle, i,
                logmel.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                cint.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                pint.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                utt_id)
            out.append((utt_id.raw[:id_len].decode(), logmel, cint, pint))
        return out
    finally:
        lib.sf_free(handle)
