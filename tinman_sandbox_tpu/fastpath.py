"""Loud fast-path admissibility (VERDICT r2 weak #5).

The producer-fused tile extraction and DSS mix-folding fast paths require
``elem_block == 8`` (so one element block is exactly 128 lanes) and a
128-lane-aligned packed width (even cubed-sphere ne). Off those shapes the
steps silently fell back to the unfused path — a user benchmarking odd ne
would silently measure the slow path. This module centralises the check:

- ``fused_admissible(eb, lanes, site)`` returns the same boolean the call
  sites used to compute inline, but emits a ONE-TIME ``FastPathFallback``
  warning per site when the answer is no, and records the decision in
  ``last_path`` so ``bench.py`` can report which variant actually ran
  (the ``path`` field in its JSON line).

The checks run at trace time (eb and the lane count are static), so the
warning cost is zero in the compiled step.
"""
from __future__ import annotations

import warnings

NPSQ = 16

#: site -> "fused" | "fallback" for every decision taken this process
last_path: dict[str, str] = {}

_warned: set[str] = set()


class FastPathFallback(UserWarning):
    """A fused fast path was inadmissible and the unfused path ran."""


def fused_admissible(eb: int, lanes: int, site: str) -> bool:
    """True iff the producer-fused extraction/mix-folding path is
    admissible for ``eb`` element blocks over ``lanes`` packed lanes.
    Records the decision under ``site`` and warns once per site on
    fallback."""
    ok = eb * NPSQ == 128 and lanes % 128 == 0
    last_path[site] = "fused" if ok else "fallback"
    if not ok and site not in _warned:
        _warned.add(site)
        warnings.warn(
            f"{site}: producer-fused extraction/mix-folding is OFF "
            f"(elem_block={eb}, lanes={lanes}; the fast path needs "
            f"elem_block=8 and a 128-aligned lane count, i.e. even ne) — "
            f"running the unfused path",
            FastPathFallback, stacklevel=3)
    return ok


def note_compact(site: str, compact: bool) -> None:
    """Refine a 'fused' decision with the slab layout actually used
    (compact fix-lane vs 128-dense — kernels/dss_pallas.py)."""
    if last_path.get(site) == "fused":
        last_path[site] = "fused_compact" if compact else "fused_dense"


def path_report() -> str:
    """Compact 'site=fused,site=fallback' summary for bench JSON."""
    if not last_path:
        return "xla"
    vals = set(last_path.values())
    if len(vals) == 1:
        return next(iter(vals))
    return ",".join(f"{k}={v}" for k, v in sorted(last_path.items()))
