"""Native (C++) host runtime with a pure-numpy fallback.

The device hot loops of this framework are XLA/Pallas programs; this module
is the native equivalent of the reference's C++ problem-assembly layer
(trajectory_estimator.h:97-122, spline_base.h:361-404): span validation,
knot activation, window base indices, segment coalescing, and time argsort
over contiguous arrays. Compiled on first use with the system C++ compiler
into a cached shared library and bound via ctypes (no pybind11 in this
environment); every entry point has a vectorized numpy fallback so the
package works without a toolchain.
"""
import ctypes
import os
import subprocess
import sysconfig
import tempfile
from pathlib import Path

import numpy as np

__all__ = [
    "available",
    "check_spans",
    "activate_spans",
    "activate_points",
    "window_bases",
    "coalesce",
    "argsort_times",
]

_SRC = Path(__file__).parent / "csrc" / "kontiki_host.cpp"
_LIB = None
_TRIED = False

_SPAN_ERRORS = {
    1: "Time span out of range for trajectory",
    2: "At least one time span begins before it ends",
    3: "Time spans are not ordered",
}


def _build_dir():
    d = os.environ.get("KONTIKI_TPU_NATIVE_CACHE")
    if d:
        return Path(d)
    return Path(tempfile.gettempdir()) / "kontiki_tpu_native"


def _load():
    """Compile (once, cached by source mtime) and bind the shared library."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("KONTIKI_TPU_NO_NATIVE"):
        return None
    try:
        bdir = _build_dir()
        bdir.mkdir(parents=True, exist_ok=True)
        so = bdir / f"kontiki_host_{int(_SRC.stat().st_mtime)}.so"
        if not so.exists():
            cxx = os.environ.get("CXX", "g++")
            tmp = so.with_suffix(".so.tmp%d" % os.getpid())
            subprocess.run(
                [cxx, "-O3", "-shared", "-fPIC", "-std=c++17", str(_SRC),
                 "-o", str(tmp)],
                check=True,
                capture_output=True,
            )
            os.replace(tmp, so)  # atomic: concurrent builders race safely
        lib = ctypes.CDLL(str(so))
        c_d = ctypes.POINTER(ctypes.c_double)
        c_u8 = ctypes.POINTER(ctypes.c_uint8)
        c_i32 = ctypes.POINTER(ctypes.c_int32)
        c_i64 = ctypes.POINTER(ctypes.c_int64)
        lib.kontiki_check_spans.restype = ctypes.c_int
        lib.kontiki_check_spans.argtypes = [
            c_d, c_d, ctypes.c_int64, ctypes.c_double, ctypes.c_double]
        lib.kontiki_activate_spans.restype = None
        lib.kontiki_activate_spans.argtypes = [
            c_d, c_d, ctypes.c_int64, ctypes.c_double, ctypes.c_double,
            ctypes.c_int64, c_u8]
        lib.kontiki_activate_points.restype = ctypes.c_int
        lib.kontiki_activate_points.argtypes = [
            c_d, ctypes.c_int64, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_int64, c_u8]
        lib.kontiki_window_bases.restype = None
        lib.kontiki_window_bases.argtypes = [
            c_d, ctypes.c_int64, ctypes.c_double, ctypes.c_double,
            ctypes.c_int64, ctypes.c_int64, c_i32]
        lib.kontiki_coalesce.restype = ctypes.c_int64
        lib.kontiki_coalesce.argtypes = [
            c_u8, ctypes.c_int64, c_i64, c_i64]
        lib.kontiki_argsort.restype = None
        lib.kontiki_argsort.argtypes = [c_d, ctypes.c_int64, c_i64]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available():
    """True if the compiled native library is loaded (or loadable)."""
    return _load() is not None


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def _as_f64(a):
    return np.ascontiguousarray(a, dtype=np.float64)


def check_spans(t1, t2, tmin, tmax):
    """Raise ValueError on invalid spans (trajectory_estimator.h:97-122)."""
    t1 = _as_f64(t1)
    t2 = _as_f64(t2)
    lib = _load()
    if lib is not None:
        code = lib.kontiki_check_spans(
            _ptr(t1, ctypes.c_double), _ptr(t2, ctypes.c_double),
            len(t1), float(tmin), float(tmax))
    else:
        code = 0
        if np.any(t1 < tmin) or np.any(t2 >= tmax):
            code = 1
        elif np.any(t1 > t2):
            code = 2
        elif len(t1) > 1 and np.any(np.diff(t1) < 0):
            code = 3
    if code:
        raise ValueError(_SPAN_ERRORS[code])


def activate_spans(t1, t2, t0, dt, nknots, active=None):
    """Mark knots in the 4-knot windows of [t1, t2] spans active
    (spline_base.h:361-404). Mutates/returns a uint8 [nknots] array."""
    t1 = _as_f64(t1)
    t2 = _as_f64(t2)
    if active is None:
        active = np.zeros(nknots, dtype=np.uint8)
    lib = _load()
    if lib is not None:
        lib.kontiki_activate_spans(
            _ptr(t1, ctypes.c_double), _ptr(t2, ctypes.c_double), len(t1),
            float(t0), float(dt), nknots, _ptr(active, ctypes.c_uint8))
        return active
    i1 = np.clip(np.floor((t1 - t0) / dt).astype(np.int64), 0, None)
    i2 = np.minimum(np.floor((t2 - t0) / dt).astype(np.int64) + 4, nknots)
    # vectorized interval painting via a difference array
    diff = np.zeros(nknots + 1, dtype=np.int64)
    valid = i1 < i2
    np.add.at(diff, i1[valid], 1)
    np.add.at(diff, i2[valid], -1)
    active |= (np.cumsum(diff[:-1]) > 0).astype(np.uint8)
    return active


def activate_points(t, slack, tmin, tmax, t0, dt, nknots, active=None):
    """Fused check+activate for point measurements at times t with symmetric
    slack (the IMU fast path). Raises on invalid spans."""
    t = _as_f64(t)
    if active is None:
        active = np.zeros(nknots, dtype=np.uint8)
    lib = _load()
    if lib is not None:
        code = lib.kontiki_activate_points(
            _ptr(t, ctypes.c_double), len(t), float(slack), float(tmin),
            float(tmax), float(t0), float(dt), nknots,
            _ptr(active, ctypes.c_uint8))
        if code:
            raise ValueError(_SPAN_ERRORS[code])
        return active
    check_spans(t - slack, t + slack, tmin, tmax)
    return activate_spans(t - slack, t + slack, t0, dt, nknots, active)


def window_bases(t, t0, dt, nknots, W):
    """clip(floor((t - t0)/dt), 0, nknots - W) as int32."""
    t = _as_f64(t)
    lib = _load()
    if lib is not None:
        out = np.empty(len(t), dtype=np.int32)
        lib.kontiki_window_bases(
            _ptr(t, ctypes.c_double), len(t), float(t0), float(dt), nknots,
            int(W), _ptr(out, ctypes.c_int32))
        return out
    return np.clip(
        np.floor((t - t0) / dt).astype(np.int64), 0, nknots - W
    ).astype(np.int32)


def coalesce(active):
    """Coalesce an active mask into contiguous (start, stop) segments —
    the reference's segment construction (spline_base.h:377-390)."""
    active = np.ascontiguousarray(active, dtype=np.uint8)
    n = len(active)
    lib = _load()
    if lib is not None:
        starts = np.empty(n // 2 + 1, dtype=np.int64)
        stops = np.empty(n // 2 + 1, dtype=np.int64)
        k = lib.kontiki_coalesce(
            _ptr(active, ctypes.c_uint8), n,
            _ptr(starts, ctypes.c_int64), _ptr(stops, ctypes.c_int64))
        return list(zip(starts[:k].tolist(), stops[:k].tolist()))
    a = active.astype(bool)
    edges = np.flatnonzero(np.diff(np.concatenate([[False], a, [False]])))
    return list(zip(edges[0::2].tolist(), edges[1::2].tolist()))


def argsort_times(t):
    """Stable argsort by time (int64), used to order bucket rows so the
    knot-segment sharding sees contiguous windows per shard."""
    t = _as_f64(t)
    lib = _load()
    if lib is not None:
        out = np.empty(len(t), dtype=np.int64)
        lib.kontiki_argsort(_ptr(t, ctypes.c_double), len(t),
                            _ptr(out, ctypes.c_int64))
        return out
    return np.argsort(t, kind="stable")
