"""Lazy g++ build of the native kernel library.

The .so is cached next to the sources; everything that uses it has a
numpy fallback, so a missing compiler never blocks the framework.
"""

import os
import subprocess
import threading
from pathlib import Path

_HERE = Path(__file__).parent
_SRC = _HERE / "src" / "second_native.cpp"
_BUILD_DIR = _HERE / "build"
_LIB = _BUILD_DIR / "libsecond_native.so"
_lock = threading.Lock()
_failed = False


def lib_path():
    """Build (once) and return the shared library path, or None."""
    global _failed
    if _LIB.is_file() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return str(_LIB)
    if _failed:
        return None
    with _lock:
        if _LIB.is_file() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
            return str(_LIB)
        _BUILD_DIR.mkdir(exist_ok=True)
        cmd = [
            os.environ.get("CXX", "g++"),
            "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
            str(_SRC), "-o", str(_LIB),
        ]
        try:
            subprocess.run(
                cmd, check=True, capture_output=True, timeout=120)
        except (subprocess.SubprocessError, OSError):
            _failed = True
            return None
    return str(_LIB)


def load_lib():
    """ctypes-load the library, rebuilding once if a stale artifact
    (e.g. built with -march=native on another machine) fails to load.
    Returns the CDLL or None; callers keep their numpy fallbacks."""
    import ctypes

    path = lib_path()
    if path is None:
        return None
    try:
        return ctypes.CDLL(path)
    except OSError:
        try:
            Path(path).unlink()
        except OSError:
            return None
        path = lib_path()
        if path is None:
            return None
        try:
            return ctypes.CDLL(path)
        except OSError:
            return None
