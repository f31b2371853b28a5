"""Native host runtime: build-on-demand C++ library bound via ctypes.

Reference equivalent: the reference ships its runtime as a C++17 shared
library (cpp/open3d/) with pybind11 bindings. Here the device compute path
is XLA; the native library owns the host-side hot paths (LZF codec, AoS/SoA
record transforms, threaded file prefetch). pybind11 is unavailable in this
image, so the ABI is plain C consumed through ctypes; everything degrades
to pure-Python fallbacks when no C++ toolchain is present.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import threading
from typing import Optional

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "src", "o3dtpu_native.cpp")


def _build_dir() -> str:
    d = os.environ.get(
        "OPEN3D_TPU_NATIVE_CACHE", os.path.join(os.path.expanduser("~"), ".open3d_tpu", "native")
    )
    os.makedirs(d, exist_ok=True)
    return d


def _compile() -> Optional[str]:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha1(f.read()).hexdigest()[:16]
    out = os.path.join(_build_dir(), f"o3dtpu_native_{tag}.so")
    if os.path.isfile(out):
        return out
    tmp = out + f".build{os.getpid()}"
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, out)
        return out
    except Exception:
        return None


def load() -> Optional[ctypes.CDLL]:
    """The native library, or None if unavailable (pure-Python fallbacks)."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so = _compile()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.o3d_lzf_decompress.restype = ctypes.c_long
        lib.o3d_lzf_decompress.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_long,
        ]
        lib.o3d_lzf_compress.restype = ctypes.c_long
        lib.o3d_lzf_compress.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_long,
        ]
        lib.o3d_prefetcher_create.restype = ctypes.c_void_p
        lib.o3d_prefetcher_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ]
        lib.o3d_prefetcher_wait.restype = ctypes.c_long
        lib.o3d_prefetcher_wait.argtypes = [ctypes.c_void_p, ctypes.c_long]
        lib.o3d_prefetcher_take.restype = ctypes.c_long
        lib.o3d_prefetcher_take.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_long,
        ]
        lib.o3d_prefetcher_peek_size.restype = ctypes.c_long
        lib.o3d_prefetcher_peek_size.argtypes = [ctypes.c_void_p, ctypes.c_long]
        lib.o3d_prefetcher_destroy.restype = None
        lib.o3d_prefetcher_destroy.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return _LIB


def lzf_decompress(data: bytes, expected_size: int) -> bytes:
    lib = load()
    if lib is None:
        from open3d_tpu.io.pcd import lzf_decompress as py

        return py(data, expected_size)
    out = ctypes.create_string_buffer(expected_size)
    n = lib.o3d_lzf_decompress(data, len(data), out, expected_size)
    if n < 0:
        raise ValueError("malformed LZF stream")
    return out.raw[:n]


def lzf_compress(data: bytes) -> bytes:
    lib = load()
    if lib is None:
        from open3d_tpu.io.pcd import lzf_compress as py

        return py(data)
    cap = len(data) + len(data) // 16 + 64 + len(data) // 32
    out = ctypes.create_string_buffer(cap)
    n = lib.o3d_lzf_compress(data, len(data), out, cap)
    if n < 0:
        raise ValueError("LZF compression overflow")
    return out.raw[:n]


class FilePrefetcher:
    """Threaded read-ahead over an ordered file list (native; Python-thread
    fallback). Usage: with FilePrefetcher(paths) as p: data = p.get(i)."""

    def __init__(self, paths, n_threads: int = 4, depth: int = 8):
        self.paths = [os.fspath(p) for p in paths]
        self._lib = load()
        self._handle = None
        self._py_cache = None
        if self._lib is not None:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths]
            )
            self._keepalive = arr
            self._handle = ctypes.c_void_p(
                self._lib.o3d_prefetcher_create(arr, len(self.paths), n_threads, depth)
            )
        else:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=n_threads)
            self._py_cache = {
                i: self._pool.submit(self._read, p) for i, p in enumerate(self.paths)
            }

    @staticmethod
    def _read(path):
        with open(path, "rb") as f:
            return f.read()

    def get(self, i: int) -> bytes:
        if self._handle is not None:
            sz = self._lib.o3d_prefetcher_wait(self._handle, i)
            buf = ctypes.create_string_buffer(max(sz, 1))
            n = self._lib.o3d_prefetcher_take(self._handle, i, buf, max(sz, 1))
            if n < 0:
                raise RuntimeError(f"prefetcher lost file {i}")
            return buf.raw[:n]
        return self._py_cache[i].result()

    def close(self):
        if self._handle is not None:
            self._lib.o3d_prefetcher_destroy(self._handle)
            self._handle = None
        elif self._py_cache is not None:
            self._pool.shutdown(wait=False)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
