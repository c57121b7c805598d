"""ctypes bindings for the native host components (native/dvbs_native.cpp).

Loads native/libdvbs_native.so when present; callers fall back to the
pure-Python implementations otherwise (ts_deframer.py, bbframe_parser.py).
Build with `make -C native`.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_SO = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                   "libdvbs_native.so")
_lib = None


def available() -> bool:
    global _lib
    if _lib is None and os.path.exists(_SO):
        lib = ctypes.CDLL(_SO)
        lib.deframer_create.restype = ctypes.c_void_p
        lib.deframer_create.argtypes = [ctypes.c_int]
        lib.deframer_destroy.argtypes = [ctypes.c_void_p]
        for fn in ("deframer_locked", "deframer_inverted"):
            getattr(lib, fn).restype = ctypes.c_int
            getattr(lib, fn).argtypes = [ctypes.c_void_p]
        for fn in ("deframer_frames_ok", "deframer_sync_errors"):
            getattr(lib, fn).restype = ctypes.c_long
            getattr(lib, fn).argtypes = [ctypes.c_void_p]
        lib.deframer_feed.restype = ctypes.c_int
        lib.deframer_feed.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
        lib.tsparser_create.restype = ctypes.c_void_p
        lib.tsparser_create.argtypes = [ctypes.c_int]
        lib.tsparser_destroy.argtypes = [ctypes.c_void_p]
        lib.tsparser_bb_proc.restype = ctypes.c_long
        lib.tsparser_bb_proc.argtypes = [ctypes.c_void_p]
        lib.tsparser_feed.restype = ctypes.c_long
        lib.tsparser_feed.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long]
        lib.tsparser_mark_gap.argtypes = [ctypes.c_void_p]
        lib.tsparser_last_header.restype = ctypes.c_int
        lib.tsparser_last_header.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)]
        lib.tsparser_state_size.restype = ctypes.c_long
        lib.tsparser_state_size.argtypes = [ctypes.c_void_p]
        lib.tsparser_get_state.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)]
        lib.tsparser_set_state.restype = ctypes.c_int
        lib.tsparser_set_state.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_long]
        globals()["_lib"] = lib
    return _lib is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


class NativeTSDeframer:
    """Drop-in for io.ts_deframer.TSDeframer (C++ implementation)."""

    def __init__(self, max_resync_errors: int = 4):
        assert available()
        self._h = _lib.deframer_create(max_resync_errors)

    def __del__(self):
        if getattr(self, "_h", None) and _lib is not None:
            _lib.deframer_destroy(self._h)
            self._h = None

    @property
    def locked(self):
        return bool(_lib.deframer_locked(self._h))

    @property
    def inverted(self):
        return bool(_lib.deframer_inverted(self._h))

    @property
    def frames_ok(self):
        return int(_lib.deframer_frames_ok(self._h))

    @property
    def sync_errors(self):
        return int(_lib.deframer_sync_errors(self._h))

    def feed(self, bits: np.ndarray) -> np.ndarray:
        bits = np.ascontiguousarray(bits, np.uint8)
        max_frames = len(bits) // (1632 * 8) + 3
        out = np.empty(max_frames * 1632, np.uint8)
        n = _lib.deframer_feed(self._h, _ptr(bits), len(bits), _ptr(out),
                               max_frames)
        return out[:n * 1632].reshape(n, 1632).copy()


class NativeTSParser:
    """BBFRAME parser (C++): TS packets and GSE->GRE, both modes."""

    def __init__(self, kbch: int):
        assert available()
        self.kbch = kbch
        self._h = _lib.tsparser_create(kbch)

    def __del__(self):
        if getattr(self, "_h", None) and _lib is not None:
            _lib.tsparser_destroy(self._h)
            self._h = None

    @property
    def last_bb_proc(self):
        return int(_lib.tsparser_bb_proc(self._h))

    @property
    def last_header(self):
        """Latest validated BBHEADER (metrics), or None."""
        hdr = np.zeros(10, np.uint8)
        if not _lib.tsparser_last_header(self._h, _ptr(hdr)):
            return None
        from ..spec import bbheader
        return bbheader.BBHeader.parse(hdr)

    def get_state(self) -> bytes:
        """Serialized mutable parser state (checkpoint/resume)."""
        n = _lib.tsparser_state_size(self._h)
        buf = np.empty(n, np.uint8)
        _lib.tsparser_get_state(self._h, _ptr(buf))
        return buf.tobytes()

    def set_state(self, blob: bytes):
        buf = np.frombuffer(blob, np.uint8).copy()
        rc = _lib.tsparser_set_state(self._h, _ptr(buf), len(buf))
        if rc != 0:
            raise ValueError("corrupt TS-parser state blob")

    def mark_gap(self):
        _lib.tsparser_mark_gap(self._h)

    def feed(self, frames: np.ndarray) -> bytes:
        frames = np.ascontiguousarray(np.atleast_2d(frames), np.uint8)
        n = frames.shape[0]
        # GSE PDUs reassembled across earlier frames can emit up to
        # 3 slots x 64 KB beyond this call's data-field bytes
        cap = n * (self.kbch // 8 + 64) + 3 * (1 << 16) + 188
        out = np.empty(cap, np.uint8)
        w = _lib.tsparser_feed(self._h, _ptr(frames), n, _ptr(out), cap)
        return out[:w].tobytes()
