"""ctypes binding + lazy build for the native async chain writer."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "chain_writer.cpp")
_SO = os.path.join(_HERE, "libchainwriter.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _load():
    global _lib, _build_failed
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-o", _SO, _SRC, "-lpthread"],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
        except (OSError, subprocess.CalledProcessError):
            _build_failed = True
            return None
        lib.cw_open.restype = ctypes.c_int64
        lib.cw_open.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                ctypes.c_int32]
        lib.cw_write.restype = ctypes.c_int32
        lib.cw_write.argtypes = [ctypes.c_int64,
                                 ctypes.POINTER(ctypes.c_float),
                                 ctypes.c_int64]
        lib.cw_flush.restype = ctypes.c_int32
        lib.cw_flush.argtypes = [ctypes.c_int64]
        lib.cw_queue_depth.restype = ctypes.c_int64
        lib.cw_queue_depth.argtypes = [ctypes.c_int64]
        lib.cw_close.restype = ctypes.c_int32
        lib.cw_close.argtypes = [ctypes.c_int64]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


class NativeChainWriter:
    """Asynchronous chain sink: ``write(block)`` copies and returns
    immediately; a C++ thread formats and appends (CSV text or raw float32
    binary).  Drop-in faster backend for
    :class:`glabc_tpu.utils.io.ChainWriter` single-file mode."""

    def __init__(self, path: str, dim: int, binary: bool = False):
        lib = _load()
        if lib is None:
            raise RuntimeError("native chain writer unavailable (no g++?)")
        self._lib = lib
        self._dim = int(dim)
        # truncate, then reopen append in C++
        open(path, "wb").close()
        self._h = lib.cw_open(path.encode(), self._dim, 1 if binary else 0)
        if self._h < 0:
            raise OSError(f"cw_open failed for {path}")

    def write(self, block: np.ndarray) -> None:
        """block: (steps, dim) float32 (contiguous copy made if needed)."""
        block = np.ascontiguousarray(block, dtype=np.float32)
        assert block.ndim == 2 and block.shape[1] == self._dim
        ptr = block.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        rc = self._lib.cw_write(self._h, ptr, block.shape[0])
        if rc != 0:
            raise OSError("cw_write failed")

    def queue_depth(self) -> int:
        return int(self._lib.cw_queue_depth(self._h))

    def flush(self) -> None:
        self._lib.cw_flush(self._h)

    def close(self) -> None:
        if self._h >= 0:
            self._lib.cw_close(self._h)
            self._h = -1

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
