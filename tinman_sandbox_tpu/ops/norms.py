"""Kahan-compensated norms + result dumps (validation tooling).

Parity with the reference's validation mechanisms (SURVEY §4):
  * compute_norm — Kahan-summation L2 norm (utils_mod.F90:10-33,
    cxx/basic/compute_and_apply_rhs.cpp:347-363);
  * print_results_2norm — pre/post norm report (main.F90:168-194);
  * dump_results_to_file — per-element text dumps for offline diff
    (cxx/basic/compute_and_apply_rhs.cpp:395-481).
"""
from __future__ import annotations

import os

import numpy as np

__all__ = ["kahan_norm", "state_norms", "print_results_2norm", "dump_results"]


def kahan_norm(x) -> float:
    """L2 norm with Kahan-compensated summation of squares in f64, exactly
    the reference's loop order (flattened C order)."""
    flat = np.asarray(x, np.float64).reshape(-1)
    s = 0.0
    c = 0.0
    for v in flat:
        y = v * v - c
        t = s + y
        c = (t - s) - y
        s = t
    return float(np.sqrt(s))


def _fast_norm(x) -> float:
    """f64 pairwise-summation norm (numpy) — bitwise-stable enough for
    cross-implementation comparison; used for large arrays where the scalar
    Kahan loop would be slow."""
    flat = np.asarray(x, np.float64).reshape(-1)
    return float(np.sqrt(np.sum(flat * flat)))


def state_norms(state, exact: bool | None = None) -> dict:
    """{'v': ||u,v||, 'T': ||T||, 'dp': ||dp3d||} over all time levels
    (main.F90:168-194 prints exactly these three).

    ``exact=None`` (default) uses the reference's scalar Kahan loop up to
    200k values and numpy's f64 pairwise summation above that (both are
    f64-accurate to ~1 ulp of the norm; the scalar loop is just too slow on
    ne30-class grids). Pass ``exact=True`` to force Kahan at any size,
    ``exact=False`` to force pairwise."""
    u = np.asarray(state.u)
    v = np.asarray(state.v)
    norm = kahan_norm if (exact or (exact is None and u.size <= 200_000)) \
        else _fast_norm
    uv = np.stack([u, v])
    return {
        "v": norm(uv),
        "T": norm(state.t),
        "dp": norm(state.dp3d),
    }


def print_results_2norm(state, label: str = "", exact: bool | None = None) -> dict:
    n = state_norms(state, exact=exact)
    print(f" --- {label} norms:")
    print(f"          ||v||_2  = {n['v']:.12f}")
    print(f"          ||T||_2  = {n['T']:.12f}")
    print(f"          ||dp||_2 = {n['dp']:.12f}")
    return n


def dump_results(state, cfg, outdir: str = ".") -> list:
    """Write elem_state_{vx,vy,t,dp3d}.txt: one line per value with element/
    level indices, matching the reference dump's information content
    (cxx/basic/compute_and_apply_rhs.cpp:395-481)."""
    os.makedirs(outdir, exist_ok=True)
    fields = {
        "vx": np.asarray(state.u),
        "vy": np.asarray(state.v),
        "t": np.asarray(state.t),
        "dp3d": np.asarray(state.dp3d),
    }
    written = []
    for name, arr in fields.items():
        path = os.path.join(outdir, f"elem_state_{name}.txt")
        with open(path, "w") as f:
            tl, ne, nlev = arr.shape[:3]
            for t in range(tl):
                for e in range(ne):
                    for k in range(nlev):
                        vals = " ".join(f"{x:.17g}" for x in arr[t, e, k].reshape(-1))
                        f.write(f"tl={t} ie={e} k={k}: {vals}\n")
        written.append(path)
    return written
