"""Native (C++) host-runtime components, with pure-Python fallbacks.

The reference's disk->batch path rides torch's native DataLoader machinery
(C++ worker pools, pinned buffers); this package is the framework's own
native equivalent for the TPU host: a threaded batch reader
(:func:`read_batch`) that fills numpy buffers straight from ``.pt``
containers via ``pread`` with the GIL released (``io.cpp``).

The shared library is built lazily with ``g++`` on first use and cached
under ``~/.cache/pydrobert_tpu`` keyed by source hash. Everything degrades
gracefully: when the toolchain or a build is unavailable,
:func:`available` is False and callers use the pure-Python reader.
Disable explicitly with ``PYDROBERT_TPU_NATIVE_IO=0``.
"""

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["available", "read_batch", "native_threads"]

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "io.cpp")
_lock = threading.Lock()
_lib = None
_tried = False


class _PdtTask(ctypes.Structure):
    _fields_ = [
        ("path", ctypes.c_char_p),
        ("offset", ctypes.c_int64),
        ("nbytes", ctypes.c_int64),
        ("dst", ctypes.c_void_p),
    ]


def _cache_dir() -> str:
    base = os.environ.get(
        "PYDROBERT_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "pydrobert_tpu"),
    )
    os.makedirs(base, exist_ok=True)
    return base


def _build() -> Optional[str]:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_cache_dir(), f"pdt_io_{digest}.so")
    if os.path.exists(so_path):
        return so_path
    # build to a temp name + atomic rename: concurrent test workers race
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_cache_dir())
    os.close(fd)
    try:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
                _SRC, "-o", tmp,
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(tmp, so_path)
        return so_path
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("PYDROBERT_TPU_NATIVE_IO", "1") == "0":
            return None
        so_path = _build()
        if so_path is None:
            return None
        try:
            lib = ctypes.CDLL(so_path)
            lib.pdt_read_batch.restype = ctypes.c_int64
            lib.pdt_read_batch.argtypes = [
                ctypes.POINTER(_PdtTask),
                ctypes.c_int64,
                ctypes.c_int32,
            ]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    """True when the native reader built (or was cached) and loaded.

    The env kill-switch is honored on every call (not just the first), so
    tests and jobs can flip ``PYDROBERT_TPU_NATIVE_IO=0`` after import.
    """
    if os.environ.get("PYDROBERT_TPU_NATIVE_IO", "1") == "0":
        return False
    return _load() is not None


def native_threads() -> int:
    """Worker threads for batch reads (env override, else cpu count)."""
    env = os.environ.get("PYDROBERT_TPU_NATIVE_IO_THREADS")
    if env:
        return max(1, int(env))
    return max(1, min(16, os.cpu_count() or 1))


def read_batch(
    tasks: Sequence[Tuple[str, int, np.ndarray]],
    nthreads: Optional[int] = None,
) -> None:
    """Fill each task's array with bytes from its file, in parallel.

    `tasks` are ``(path, byte_offset, out_array)`` triples; ``out_array``
    must be C-contiguous and writable (its ``nbytes`` are read). Raises
    ``OSError`` naming the first failing file. Requires :func:`available`.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library unavailable")
    n = len(tasks)
    if n == 0:
        return
    arr = (_PdtTask * n)()
    keep: List[bytes] = []
    for i, (path, offset, out) in enumerate(tasks):
        if not (out.flags["C_CONTIGUOUS"] and out.flags["WRITEABLE"]):
            raise ValueError("output arrays must be C-contiguous writable")
        b = os.fsencode(path)
        keep.append(b)
        arr[i].path = b
        arr[i].offset = offset
        arr[i].nbytes = out.nbytes
        arr[i].dst = out.ctypes.data
    rc = lib.pdt_read_batch(arr, n, nthreads or native_threads())
    if rc != 0:
        bad = tasks[int(rc) - 1][0]
        raise OSError(f"native batch read failed on {bad!r}")
