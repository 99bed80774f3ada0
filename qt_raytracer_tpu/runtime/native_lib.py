"""ctypes loader for the native runtime library (native/libqtrt_native.so).

The compute path is JAX/Pallas; the runtime around it is native where the
reference's is (C++ builder/loader instead of the Qt/C++ orchestrator —
SURVEY.md §2 "Native components"). Python↔C++ binding is plain ctypes (no
pybind11 in the image). The library is built on demand with `make -C native`;
every consumer has a pure-python fallback, so the framework works without a
toolchain too.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libqtrt_native.so"
_lock = threading.Lock()
_lib = None
_tried = False


def load_native():
    """Return the loaded CDLL, building it if needed; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not _LIB_PATH.exists():
                subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                               capture_output=True, timeout=120)
            lib = ctypes.CDLL(str(_LIB_PATH))
            _configure(lib)
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def _configure(lib) -> None:
    c_float_p = ctypes.POINTER(ctypes.c_float)
    c_int_p = ctypes.POINTER(ctypes.c_int32)
    lib.qtrt_build_bvh.restype = ctypes.c_int
    lib.qtrt_build_bvh.argtypes = [
        c_float_p, c_float_p, ctypes.c_int, ctypes.c_int,
        c_float_p, c_float_p, c_int_p, c_int_p, c_int_p, c_int_p,
    ]
    lib.qtrt_obj_count.restype = ctypes.c_int
    lib.qtrt_obj_count.argtypes = [ctypes.c_char_p, c_int_p, c_int_p]
    lib.qtrt_obj_load.restype = ctypes.c_int
    lib.qtrt_obj_load.argtypes = [ctypes.c_char_p, c_float_p, c_int_p]
