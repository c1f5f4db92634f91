"""Native C++ runtime components, loaded via ctypes.

The reference's latency-critical host paths are C++ (`dart/realtime/
RealTimeControlBuffer`, `Ticker`, the vendored ODE LCP); their TPU-side
equivalents live here:

  * RtControlBuffer — seqlock double-buffered control plans: the planner
    (Python/TPU) publishes, robot control threads read lock-free without
    touching the GIL
  * ticker_now / sleep_until — monotonic clock + precise periodic timing
  * lcp_gold — independent deep-convergence boxed-LCP solver used as the
    golden reference for the device PGS kernel in tests

Builds on first import with the repo Makefile (g++ is part of the image).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libnimble_native.so")
_BUILD_LOCK = threading.Lock()
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    with _BUILD_LOCK:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["make", "-C", _DIR], check=True, capture_output=True
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.rtb_create.restype = ctypes.c_void_p
        lib.rtb_create.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.rtb_destroy.argtypes = [ctypes.c_void_p]
        lib.rtb_publish.argtypes = [
            ctypes.c_void_p, ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.rtb_control_at.restype = ctypes.c_int
        lib.rtb_control_at.argtypes = [
            ctypes.c_void_p, ctypes.c_double, ctypes.POINTER(ctypes.c_double)
        ]
        lib.rtb_num_published.restype = ctypes.c_uint64
        lib.rtb_num_published.argtypes = [ctypes.c_void_p]
        lib.ticker_now.restype = ctypes.c_double
        lib.ticker_sleep_until.argtypes = [ctypes.c_double]
        lib.lcp_gold_solve.restype = ctypes.c_double
        lib.lcp_gold_solve.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_double),
        ]
        _lib = lib
    return _lib


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class RtControlBuffer:
    """Native double-buffered control plan (RealTimeControlBuffer)."""

    def __init__(self, horizon: int, na: int):
        self._lib = _load()
        self.horizon, self.na = horizon, na
        self._h = self._lib.rtb_create(horizon, na)

    def publish(self, start_time: float, dt: float, u) -> None:
        u = np.ascontiguousarray(np.asarray(u, dtype=np.float64))
        assert u.shape == (self.horizon, self.na)
        self._lib.rtb_publish(self._h, float(start_time), float(dt), _dptr(u))

    def control_at(self, t: float):
        out = np.zeros(self.na, dtype=np.float64)
        idx = self._lib.rtb_control_at(self._h, float(t), _dptr(out))
        return (idx, out) if idx >= 0 else (None, None)

    @property
    def num_published(self) -> int:
        return int(self._lib.rtb_num_published(self._h))

    def __del__(self):
        try:
            self._lib.rtb_destroy(self._h)
        except Exception:
            pass


def ticker_now() -> float:
    return float(_load().ticker_now())


def ticker_sleep_until(t: float) -> None:
    _load().ticker_sleep_until(float(t))


def lcp_gold(A, b, lo, hi, fscale, findex, iters: int = 10000):
    """Deep-convergence boxed LCP; returns (x, complementarity_residual)."""
    lib = _load()
    A = np.ascontiguousarray(np.asarray(A, dtype=np.float64))
    b = np.ascontiguousarray(np.asarray(b, dtype=np.float64))
    lo = np.ascontiguousarray(np.asarray(lo, dtype=np.float64))
    hi = np.ascontiguousarray(np.asarray(hi, dtype=np.float64))
    fscale = np.ascontiguousarray(np.asarray(fscale, dtype=np.float64))
    fi = np.ascontiguousarray(np.asarray(findex, dtype=np.int32))
    m = b.shape[0]
    x = np.zeros(m, dtype=np.float64)
    resid = lib.lcp_gold_solve(
        _dptr(A), _dptr(b), _dptr(lo), _dptr(hi), _dptr(fscale),
        fi.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), m, int(iters), _dptr(x)
    )
    return x, float(resid)
