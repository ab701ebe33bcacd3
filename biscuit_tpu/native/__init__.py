"""ctypes loader for biscuit_tpu's native (C++) components.

Compiles lazily with g++ on first use (no pybind11 in this environment); the
shared object is cached next to the sources and rebuilt when any .cpp is newer.
"""
import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "_build", "libbiscuit_native.so")
_SOURCES = [os.path.join(_DIR, f) for f in sorted(os.listdir(_DIR)) if f.endswith(".cpp")]

_lib = None


def _build() -> None:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    base = ["g++", "-O3", "-funroll-loops", "-std=c++17", "-shared", "-fPIC",
            "-o", _SO]
    tail = _SOURCES + ["-lz", "-lpthread"]
    # -march=native turns __builtin_popcount into the POPCNT instruction
    # (the occ4 hot loop); fall back to the portable build if unsupported.
    r = subprocess.run(base[:2] + ["-march=native"] + base[2:] + tail,
                       capture_output=True)
    if r.returncode != 0:
        subprocess.run(base + tail, check=True)


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        stale = not os.path.exists(_SO) or any(
            os.path.getmtime(src) > os.path.getmtime(_SO)
            for src in _SOURCES + [os.path.join(_DIR, "__init__.py")]
        )
        if stale:
            _build()
        _lib = ctypes.CDLL(_SO)
        _declare(_lib)
    return _lib


def _declare(L: ctypes.CDLL) -> None:
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    L.sais_u8_i32.argtypes = [u8p, i32p, ctypes.c_int32, ctypes.c_int32]
    L.sais_u8_i32.restype = ctypes.c_int
    L.sais_u8_i64.argtypes = [u8p, i64p, ctypes.c_int64, ctypes.c_int64]
    L.sais_u8_i64.restype = ctypes.c_int
    L.bwt_from_sa_i64.argtypes = [u8p, i64p, u8p, ctypes.c_int64]
    L.bwt_from_sa_i64.restype = ctypes.c_int64


def suffix_array(text: np.ndarray, alphabet_size: int = 4) -> np.ndarray:
    """Suffix array of a uint8 text (no sentinel; virtual $ is smallest).
    Uses the int32 SA-IS when the text fits (half the memory traffic)."""
    text = np.ascontiguousarray(text, dtype=np.uint8)
    n = len(text)
    if n < (1 << 31) - 16:
        sa32 = np.empty(n, dtype=np.int32)
        rc = lib().sais_u8_i32(text, sa32, n, alphabet_size)
        if rc != 0:
            raise RuntimeError(f"sais failed rc={rc}")
        return sa32.astype(np.int64)
    sa = np.empty(n, dtype=np.int64)
    rc = lib().sais_u8_i64(text, sa, n, alphabet_size)
    if rc != 0:
        raise RuntimeError(f"sais failed rc={rc}")
    return sa


def bwt_from_sa(text: np.ndarray, sa: np.ndarray):
    """Return (bwt_codes uint8[n], primary) in the reference bwt_t convention
    (the '$' row removed; primary = rank of the row starting at position 0)."""
    text = np.ascontiguousarray(text, dtype=np.uint8)
    sa = np.ascontiguousarray(sa, dtype=np.int64)
    bwt = np.empty(len(text), dtype=np.uint8)
    primary = lib().bwt_from_sa_i64(text, sa, bwt, len(text))
    if primary < 0:
        raise RuntimeError("bwt_from_sa: SA does not contain 0")
    return bwt, int(primary)
