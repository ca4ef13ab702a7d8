"""Native (C++) codec core, loaded via ctypes with graceful fallback.

`get_lib()` returns the loaded library or None; `build()` compiles it
with g++ (no external deps).  The Python layers never require it.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libfsi_native.so")
_LIB = None
_TRIED = False


def build(force: bool = False) -> str | None:
    src = os.path.join(_DIR, "refserial_core.cpp")
    if force or not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(src)):
        try:
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, src],
                check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    return _SO


def get_lib():
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        path = build()
        if path and os.path.exists(path):
            lib = ctypes.CDLL(path)
            lib.fsi_scan_zz_array.restype = ctypes.c_longlong
            lib.fsi_scan_zz_array.argtypes = [
                ctypes.c_char_p, ctypes.c_longlong, ctypes.c_longlong,
                ctypes.c_longlong, ctypes.c_longlong, ctypes.c_void_p,
                ctypes.c_void_p]
            lib.fsi_emit_zz_array.restype = ctypes.c_longlong
            lib.fsi_emit_zz_array.argtypes = [
                ctypes.c_void_p, ctypes.c_longlong, ctypes.c_longlong,
                ctypes.c_void_p, ctypes.c_void_p]
            _LIB = lib
    return _LIB
