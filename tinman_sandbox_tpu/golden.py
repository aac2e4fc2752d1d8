"""Golden regression data transcribed from the reference's test_mod.F90.

The arrays are the expected T / u / v of element 1 at time level np1 after the
canonical analytic-init run (fortran/test_mod.F90:8,299,594; checked in
fortran/main.F90:241-274). Because the reference's benchmark loop never
rotates time levels (main.F90:201-210, update_time_levels commented out),
every iteration recomputes the same np1 from unchanged n0/nm1 — the golden
arrays equal the single-step output.

Stored shape: [nlev, j, i] (Fortran fill order, tools/extract_golden.py);
`golden_caar()` returns them transposed to this framework's [nlev, i, j].
"""
from __future__ import annotations

import os
from typing import Dict

import numpy as np

_DATA = os.path.join(os.path.dirname(__file__), "data", "golden_caar.npz")


def golden_caar() -> Dict[str, np.ndarray]:
    """Returns {'T','v1','v2'} arrays of shape [nlev, np_i, np_j] (f64)."""
    with np.load(_DATA) as z:
        return {k: np.ascontiguousarray(z[k].transpose(0, 2, 1)) for k in z.files}
