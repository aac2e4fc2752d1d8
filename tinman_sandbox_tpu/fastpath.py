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


def auto_lg(nblocks: int) -> int:
    """Size-aware lane-group width (round-5 sweep, BENCH_LOCAL
    lg_sweep_*): the best width is NOT monotone in grid size —
    marginal-slope A/Bs measured lg8 best at 128 blocks (1024x72
    headline: 89.3 vs lg4 94.4 us) and at >=10,800 blocks (ne120:
    12.14 ms lg8 vs 12.49 lg5), but lg4-5 best in between (ne16 lg4
    76 vs lg8 136 us; ne30 lg5 1434 vs eb8 1670; ne60 lg5 3742 vs
    lg4 3788) — mid-size grids sit where partial VMEM residency and
    pipeline depth trade off against the per-step overhead. Returns 0
    when no width in the band divides ``nblocks``."""
    if nblocks <= 128 or nblocks >= 4096:
        prefs = (8, 6, 5, 4, 3, 2)
    else:
        prefs = (5, 4, 6, 3, 2, 8)
    return next((g for g in prefs if nblocks % g == 0), 0)


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
