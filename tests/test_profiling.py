"""Native + fallback timer registry (GPTL-equivalent)."""
import os
import time

from tinman_sandbox_tpu.profiling import Timers


def _exercise(t, tmp_path):
    with t.region("outer"):
        with t.region("inner"):
            time.sleep(0.01)
        with t.region("inner"):
            time.sleep(0.01)
    stats = t.get("inner")
    assert stats is not None
    calls, total, mn, mx = stats
    assert calls == 2
    assert total >= 0.02 and mn >= 0.009 and mx <= total
    outer = t.get("outer")
    assert outer[0] == 1 and outer[1] >= total
    assert t.get("nope") is None

    path = str(tmp_path / "Timing.dat")
    t.summary(path)
    text = open(path).read()
    assert "outer" in text and "inner" in text and "calls" in text


def test_native_timers(tmp_path):
    t = Timers(native=True)
    assert t.is_native, "native timing library failed to build/load"
    t.reset()
    _exercise(t, tmp_path)


def test_python_fallback_timers(tmp_path):
    t = Timers(native=False)
    assert not t.is_native
    _exercise(t, tmp_path)
