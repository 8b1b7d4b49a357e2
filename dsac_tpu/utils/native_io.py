"""ctypes bindings for the native decode/prefetch library (native/dsac_io.cpp).

Builds the shared library on first use (make in native/); falls back to
PIL for decoding if the toolchain is unavailable, so the pure-Python path
always works.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libdsac_io.so"
_lib = None


class NativeUnavailable(RuntimeError):
    pass


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True, timeout=120)
        return _LIB_PATH.exists()
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library; raises if impossible."""
    global _lib
    if _lib is not None:
        return _lib
    src = _NATIVE_DIR / "dsac_io.cpp"
    if (not _LIB_PATH.exists()
            or (src.exists()
                and src.stat().st_mtime > _LIB_PATH.stat().st_mtime)):
        if not _build():
            raise NativeUnavailable("could not build native/libdsac_io.so")
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.dsac_png_size.argtypes = [ctypes.c_char_p] + \
        [ctypes.POINTER(ctypes.c_int)] * 4
    lib.dsac_png_size.restype = ctypes.c_int
    lib.dsac_read_png_rgb.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.c_int]
    lib.dsac_read_png_rgb.restype = ctypes.c_int
    lib.dsac_read_png_depth16.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint16), ctypes.c_int,
        ctypes.c_int]
    lib.dsac_read_png_depth16.restype = ctypes.c_int
    lib.dsac_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.dsac_loader_create.restype = ctypes.c_void_p
    lib.dsac_loader_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_int)]
    lib.dsac_loader_next.restype = ctypes.c_int
    lib.dsac_loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def png_size(path: str) -> tuple[int, int, int, int]:
    lib = get_lib()
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    b = ctypes.c_int()
    rc = lib.dsac_png_size(path.encode(), ctypes.byref(w), ctypes.byref(h),
                           ctypes.byref(c), ctypes.byref(b))
    if rc != 0:
        raise IOError(f"dsac_png_size({path}) -> {rc}")
    return w.value, h.value, c.value, b.value


def read_rgb(path: str, width: int, height: int) -> np.ndarray:
    """Decode an 8-bit PNG to (H, W, 3) uint8 RGB via the native lib,
    falling back to PIL."""
    try:
        lib = get_lib()
    except NativeUnavailable:
        from PIL import Image
        return np.asarray(Image.open(path).convert("RGB"), np.uint8)
    out = np.empty((height, width, 3), np.uint8)
    rc = lib.dsac_read_png_rgb(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        width, height)
    if rc != 0:
        raise IOError(f"dsac_read_png_rgb({path}) -> {rc}")
    return out


def read_depth16(path: str, width: int, height: int) -> np.ndarray:
    """Decode a 16-bit gray PNG to (H, W) uint16 (depth in mm)."""
    try:
        lib = get_lib()
    except NativeUnavailable:
        from PIL import Image
        return np.asarray(Image.open(path), np.uint16)
    out = np.empty((height, width), np.uint16)
    rc = lib.dsac_read_png_depth16(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        width, height)
    if rc != 0:
        raise IOError(f"dsac_read_png_depth16({path}) -> {rc}")
    return out


class PrefetchLoader:
    """In-order multithreaded RGB(+depth) prefetcher over a file sequence.

    The accelerator-side analogue does not exist in the reference — frames
    are decoded synchronously in the training loop; this keeps decode off
    the critical path.
    """

    def __init__(self, rgb_paths: list[str], depth_paths: list[str] | None,
                 sequence: list[int], width: int, height: int,
                 n_threads: int = 3, capacity: int = 8):
        lib = get_lib()
        self._lib = lib
        self.width = width
        self.height = height
        self.has_depth = depth_paths is not None
        n = len(rgb_paths)
        self._rgb_arr = (ctypes.c_char_p * n)(
            *[p.encode() for p in rgb_paths])
        if depth_paths is not None:
            assert len(depth_paths) == n
            self._depth_arr = (ctypes.c_char_p * n)(
                *[p.encode() for p in depth_paths])
        else:
            self._depth_arr = None
        seq = (ctypes.c_int * len(sequence))(*sequence)
        self._n = len(sequence)
        self._emitted = 0
        self._handle = lib.dsac_loader_create(
            self._rgb_arr, self._depth_arr, n, seq, len(sequence), width,
            height, n_threads, capacity)

    def __iter__(self):
        return self

    def __next__(self):
        if self._emitted >= self._n:
            raise StopIteration
        rgb = np.empty((self.height, self.width, 3), np.uint8)
        depth = np.empty((self.height, self.width), np.uint16) \
            if self.has_depth else None
        idx = ctypes.c_int()
        rc = self._lib.dsac_loader_next(
            self._handle,
            rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            depth.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16))
            if depth is not None else None,
            ctypes.byref(idx))
        if rc == -1:
            raise StopIteration
        if rc != 0:
            raise IOError(f"frame {idx.value} failed to decode (rc={rc})")
        self._emitted += 1
        return idx.value, rgb, depth

    def close(self):
        if self._handle:
            self._lib.dsac_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
