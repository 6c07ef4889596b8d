"""Native (C++) host runtime, loaded via ctypes.

Builds ``libscann_host.so`` from scann_host.cpp on first use (g++ is in the
image; pybind11 is not, hence the C ABI + ctypes). ``load_native()`` returns
the configured ctypes library or None when compilation is impossible — the
mutator then falls back to a pure-Python core with identical semantics.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "scann_host.cpp")
_SO = os.path.join(_HERE, "libscann_host.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        # compile to a per-process temp path then atomically rename:
        # concurrent processes (multihost workers, pytest-xdist) must never
        # dlopen a partially written .so
        tmp = f"{_SO}.{os.getpid()}.tmp"
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
             _SRC, "-o", tmp],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, _SO)
        return True
    except Exception:
        return False


def load_native():
    """ctypes handle to libscann_host, building it if needed; None on failure."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None

        u64, i64, i32 = ctypes.c_uint64, ctypes.c_int64, ctypes.c_int32
        fp = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        vp = ctypes.c_void_p

        lib.mds_create.restype = vp
        lib.mds_create.argtypes = [u64, u64]
        lib.mds_destroy.argtypes = [vp]
        lib.mds_add.restype = i64
        lib.mds_add.argtypes = [vp, fp]
        lib.mds_remove.restype = ctypes.c_int
        lib.mds_remove.argtypes = [vp, u64]
        lib.mds_update.restype = ctypes.c_int
        lib.mds_update.argtypes = [vp, u64, fp]
        lib.mds_get.restype = ctypes.c_int
        lib.mds_get.argtypes = [vp, u64, fp]
        lib.mds_exists.restype = ctypes.c_int
        lib.mds_exists.argtypes = [vp, u64]
        lib.mds_size.restype = u64
        lib.mds_size.argtypes = [vp]
        lib.mds_rows.restype = u64
        lib.mds_rows.argtypes = [vp]
        lib.mds_snapshot.restype = u64
        lib.mds_snapshot.argtypes = [vp, fp, u8p, u64]
        lib.mds_compact.restype = u64
        lib.mds_compact.argtypes = [vp]

        lib.mbuf_create.restype = vp
        lib.mbuf_create.argtypes = [u64]
        lib.mbuf_destroy.argtypes = [vp]
        lib.mbuf_push.restype = ctypes.c_int
        lib.mbuf_push.argtypes = [vp, i32, u64, fp, u64]
        lib.mbuf_len.restype = u64
        lib.mbuf_len.argtypes = [vp]
        lib.mbuf_pop.restype = ctypes.c_int
        lib.mbuf_pop.argtypes = [vp, ctypes.POINTER(i32), ctypes.POINTER(u64),
                                 ctypes.POINTER(u64), fp, u64]
        _lib = lib
        return _lib
