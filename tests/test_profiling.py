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


def test_native_usr_sys_and_parent_attribution(tmp_path):
    """GPTL-depth features: per-region usr CPU time distinguishes busy work
    from sleeps, and the same region name under two parents reports
    separately (full call-path keying) with parents before children."""
    import time

    from tinman_sandbox_tpu.profiling import Timers

    t = Timers()
    if not t.is_native:
        import pytest

        pytest.skip("no native toolchain")
    with t.region("outer"):
        with t.region("leaf"):
            sum(i * i for i in range(400000))       # CPU-bound
    with t.region("outer2"):
        with t.region("leaf"):
            time.sleep(0.03)                        # idle
    calls, total, mn, mx, usr, sys_ = t.get_full("leaf")
    assert calls == 2
    assert usr > 0.005, f"usr CPU time missing: {usr}"
    path = tmp_path / "Timing.dat"
    t.summary(str(path))
    lines = path.read_text().splitlines()
    # two separate 'leaf' rows (one per parent), each indented under it
    leaf_rows = [ln for ln in lines if ln.lstrip().startswith("leaf")]
    assert len(leaf_rows) == 2
    assert lines.index([l for l in lines if l.startswith("outer ")][0]) \
        < lines.index(leaf_rows[0])
    assert "self_s" in lines[0] and "usr_s" in lines[0]
