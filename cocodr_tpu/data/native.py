"""ctypes bindings for the native C++ record gather (native/recordio.cpp).

Falls back transparently to the numpy memmap reader when the shared library
is missing; `build_native()` compiles it with the repo Makefile.
"""
from __future__ import annotations

import ctypes
import json
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "librecordio.so")

_lib = None


def build_native(force: bool = False) -> bool:
    if os.path.exists(_LIB_PATH) and not force:
        return True
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not build_native():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.rio_open.restype = ctypes.c_void_p
    lib.rio_open.argtypes = [ctypes.c_char_p, ctypes.c_int32]
    lib.rio_total.restype = ctypes.c_int64
    lib.rio_total.argtypes = [ctypes.c_void_p]
    lib.rio_gather.restype = ctypes.c_int32
    lib.rio_gather.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
    ]
    lib.rio_gather_masked.restype = ctypes.c_int32
    lib.rio_gather_masked.argtypes = list(lib.rio_gather.argtypes)
    lib.rio_close.restype = None
    lib.rio_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


class NativeTokenCache:
    """Drop-in TokenCache with native threaded gathers."""

    def __init__(self, path: str, n_threads: int = 4):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native recordio library unavailable")
        with open(path + "_meta") as f:
            meta = json.load(f)
        self.max_len = int(meta["embedding_size"])
        self.total_number = int(meta["total_number"])
        self.n_threads = n_threads
        self._lib = lib
        self._h = lib.rio_open(path.encode(), self.max_len)
        if not self._h:
            raise OSError(f"rio_open failed for {path}")
        if lib.rio_total(self._h) != self.total_number:
            raise ValueError("meta total_number mismatch with file size")

    def __len__(self):
        return self.total_number

    def batch(self, indices) -> Tuple[np.ndarray, np.ndarray]:
        idx = np.ascontiguousarray(indices, np.int64)
        n = idx.shape[0]
        tokens = np.empty((n, self.max_len), np.int32)
        lens = np.empty((n,), np.int32)
        st = self._lib.rio_gather(
            self._h,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n,
            tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.n_threads,
        )
        if st != 0:
            raise IndexError("record index out of range")
        return lens, tokens

    def batch_with_mask(self, indices):
        idx = np.ascontiguousarray(indices, np.int64)
        n = idx.shape[0]
        tokens = np.empty((n, self.max_len), np.int32)
        mask = np.empty((n, self.max_len), np.int32)
        st = self._lib.rio_gather_masked(
            self._h,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n,
            tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.n_threads,
        )
        if st != 0:
            raise IndexError("record index out of range")
        return tokens, mask

    def __getitem__(self, i: int):
        lens, tokens = self.batch([i])
        return int(lens[0]), tokens[0]

    def lengths(self) -> np.ndarray:
        out = np.empty((self.total_number,), np.int32)
        chunk = 65536
        for s in range(0, self.total_number, chunk):
            idx = np.arange(s, min(s + chunk, self.total_number))
            out[s : s + len(idx)], _ = self.batch(idx)
        return out

    def close(self):
        if self._h:
            self._lib.rio_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def open_token_cache(path: str, prefer_native: bool = True, n_threads: int = 4):
    """Factory: native reader when available, numpy memmap otherwise."""
    if prefer_native and native_available():
        return NativeTokenCache(path, n_threads=n_threads)
    from cocodr_tpu.data.records import TokenCache

    return TokenCache(path)
