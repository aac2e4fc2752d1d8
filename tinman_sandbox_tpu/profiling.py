"""Named-region timing + profiler hooks.

The framework's analog of the reference's three profiling tiers (SURVEY §5):
GPTL named nested region timers (vendored C, gptl.h:117-151) -> the native
C++ library native/timing/tinman_timing.cpp via ctypes (with a pure-Python
fallback when no compiler is available); profiling_resume/pause VTune/CUDA
hooks (profiling.hpp:20-52) -> jax.profiler traces; Timer classes
(cxx/basic/timer.hpp) -> the context manager below.

Usage:
    from tinman_sandbox_tpu.profiling import timers
    with timers.region("caar compute"):
        ...
    timers.summary("Timing.dat")
"""
from __future__ import annotations

import contextlib
import ctypes
import os
import subprocess
import time
from typing import Dict, Optional

__all__ = ["Timers", "timers", "trace"]

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "lib", "libtinman_timing.so")


def _load_native() -> Optional[ctypes.CDLL]:
    """dlopen the native timer library, building it on first use."""
    if not os.path.exists(_LIB_PATH):
        build = os.path.join(_NATIVE_DIR, "build.sh")
        if not os.path.exists(build):
            return None
        try:
            subprocess.run(["sh", build], capture_output=True, check=True,
                           timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.tt_start.argtypes = [ctypes.c_char_p]
    lib.tt_stop.argtypes = [ctypes.c_char_p]
    lib.tt_get.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_double)]
    lib.tt_pr_summary_file.argtypes = [ctypes.c_char_p]
    lib.tt_initialize()
    return lib


class Timers:
    """Named nested wall-clock region timers (GPTL API shape)."""

    def __init__(self, native: bool = True):
        self._lib = _load_native() if native else None
        # python fallback state
        self._stack = []
        self._py: Dict[str, list] = {}   # name -> [calls, total, min, max, depth]
        self._order = []

    @property
    def is_native(self) -> bool:
        return self._lib is not None

    def start(self, name: str) -> None:
        if self._lib is not None:
            self._lib.tt_start(name.encode())
        else:
            self._stack.append((name, time.perf_counter()))

    def stop(self, name: str) -> None:
        if self._lib is not None:
            self._lib.tt_stop(name.encode())
            return
        top, t0 = self._stack.pop()
        assert top == name, f"mismatched stop({name}); open region {top}"
        dt = time.perf_counter() - t0
        rec = self._py.get(name)
        if rec is None:
            rec = [0, 0.0, float("inf"), 0.0, len(self._stack)]
            self._py[name] = rec
            self._order.append(name)
        rec[0] += 1
        rec[1] += dt
        rec[2] = min(rec[2], dt)
        rec[3] = max(rec[3], dt)

    @contextlib.contextmanager
    def region(self, name: str):
        self.start(name)
        try:
            yield
        finally:
            self.stop(name)

    def get(self, name: str):
        """(calls, total_s, min_s, max_s) or None (summed over parents/
        threads; use get_full for usr/sys CPU times)."""
        full = self.get_full(name)
        return full[:4] if full else None

    def get_full(self, name: str):
        """(calls, total_s, min_s, max_s, usr_s, sys_s) or None. usr/sys
        are per-thread CPU times (native backend only; the Python fallback
        reports 0.0)."""
        if self._lib is not None:
            out = (ctypes.c_double * 6)()
            if self._lib.tt_get(name.encode(), out):
                return None
            return int(out[0]), out[1], out[2], out[3], out[4], out[5]
        rec = self._py.get(name)
        return (rec[0], rec[1], rec[2], rec[3], 0.0, 0.0) if rec else None

    def summary(self, path: str) -> None:
        """Write the region table (GPTLpr_summary_file analog)."""
        if self._lib is not None:
            self._lib.tt_pr_summary_file(path.encode())
            return
        with open(path, "w") as f:
            f.write(f"{'region':<40} {'calls':>10} {'total_s':>14} "
                    f"{'min_s':>12} {'max_s':>12}\n")
            for name in self._order:
                c, tot, mn, mx, depth = self._py[name]
                f.write(f"{'  ' * depth + name:<40} {c:>10} {tot:>14.6f} "
                        f"{mn:>12.6f} {mx:>12.6f}\n")

    def reset(self) -> None:
        if self._lib is not None:
            self._lib.tt_reset()
        self._stack.clear()
        self._py.clear()
        self._order.clear()


timers = Timers()


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace scope — the profiling_resume/pause analog
    (profiling.hpp:20-52); produces an xprof/tensorboard trace."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
