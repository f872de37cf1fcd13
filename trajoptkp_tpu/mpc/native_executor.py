"""ctypes bindings for the native real-time executor core (see
native/executor.cpp).

Gives the async-MPC actor the same native runtime services the reference's
C++ sim thread had (`/root/reference/src/main.cpp:425-744`): a lock-free
latest-plan buffer and absolute-deadline pacing.  Falls back cleanly — the
Python ControlBuffer in async_mpc.py remains available when a C++ toolchain
is absent.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np


def _load():
    from .native.build import build

    lib = ctypes.CDLL(build())
    lib.cb_create.restype = ctypes.c_void_p
    lib.cb_create.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.cb_destroy.argtypes = [ctypes.c_void_p]
    lib.cb_publish.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int
    ]
    lib.cb_next.restype = ctypes.c_int
    lib.cb_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_double)]
    lib.cb_consumed_index.restype = ctypes.c_int
    lib.cb_consumed_index.argtypes = [ctypes.c_void_p]
    lib.cb_stat.restype = ctypes.c_uint64
    lib.cb_stat.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.ticker_create.restype = ctypes.c_void_p
    lib.ticker_create.argtypes = [ctypes.c_double]
    lib.ticker_destroy.argtypes = [ctypes.c_void_p]
    lib.ticker_wait.restype = ctypes.c_double
    lib.ticker_wait.argtypes = [ctypes.c_void_p]
    lib.ticker_overruns.restype = ctypes.c_uint64
    lib.ticker_overruns.argtypes = [ctypes.c_void_p]
    lib.ticker_ticks.restype = ctypes.c_uint64
    lib.ticker_ticks.argtypes = [ctypes.c_void_p]
    return lib


_LIB = None


def lib():
    global _LIB
    if _LIB is None:
        _LIB = _load()
    return _LIB


class NativeControlBuffer:
    """Seqlock latest-plan buffer: planner publishes, actor pops lock-free."""

    def __init__(self, horizon: int, nu: int):
        self._lib = lib()
        self._h = self._lib.cb_create(horizon, nu)
        self.horizon = horizon
        self.nu = nu

    def publish(self, plan: np.ndarray, start_index: int = 1) -> None:
        plan = np.ascontiguousarray(plan, dtype=np.float64)
        assert plan.shape == (self.horizon, self.nu)
        self._lib.cb_publish(
            self._h,
            plan.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            int(start_index),
        )

    def next_control(self) -> Optional[np.ndarray]:
        out = np.empty(self.nu, dtype=np.float64)
        ok = self._lib.cb_next(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        )
        return out if ok else None

    def consumed(self) -> int:
        return int(self._lib.cb_consumed_index(self._h))

    @property
    def stats(self):
        return {
            "plans_published": int(self._lib.cb_stat(self._h, 0)),
            "controls_consumed": int(self._lib.cb_stat(self._h, 1)),
            "underruns": int(self._lib.cb_stat(self._h, 2)),
        }

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.cb_destroy(self._h)
            self._h = None


class RtTicker:
    """Absolute-deadline pacing on CLOCK_MONOTONIC (replaces the reference's
    relative-sleep compensation loop, `main.cpp:552-562`, without drift)."""

    def __init__(self, period_s: float):
        self._lib = lib()
        self._h = self._lib.ticker_create(float(period_s))

    def wait(self) -> float:
        """Sleep to the next deadline; returns lateness (s), 0.0 if on time."""
        return float(self._lib.ticker_wait(self._h))

    @property
    def overruns(self) -> int:
        return int(self._lib.ticker_overruns(self._h))

    @property
    def ticks(self) -> int:
        return int(self._lib.ticker_ticks(self._h))

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.ticker_destroy(self._h)
            self._h = None
