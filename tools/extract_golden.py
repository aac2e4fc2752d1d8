#!/usr/bin/env python3
"""Extract golden regression arrays from the reference's test_mod.F90 into an .npz.

The reference embeds three 1152-value f64 arrays (Ttest / v1test / v2test) —
the expected T / u / v state of element 1 at time level np1 after the canonical
run (see /root/reference/compute_and_apply_rhs_test/fortran/test_mod.F90:8,299,594
and main.F90:241-274). This script transcribes that *data* (not code) into
tinman_sandbox_tpu/data/golden_caar.npz with Fortran index order recorded.

Fortran fill order (main.F90:243-252): ind runs i fastest, then j, then k —
i.e. Ttest reshaped to (nlev, np_j, np_i) in C order gives T[k, j, i].
"""
import re
import sys
import numpy as np

SRC = "/root/reference/compute_and_apply_rhs_test/fortran/test_mod.F90"
OUT = "/root/repo/tinman_sandbox_tpu/data/golden_caar.npz"

NP, NLEV = 4, 72
N = NP * NP * NLEV


def parse_array(text: str, name: str) -> np.ndarray:
    # match:  name(np*np*nlev) = (/ ... /)
    m = re.search(rf"{name}\s*\(np\*np\*nlev\)\s*=\s*\(/(.*?)/\)", text, re.S)
    if not m:
        raise SystemExit(f"array {name} not found in {SRC}")
    body = m.group(1)
    # values like 2000.2078920888462D0 or 33.2369243757343d0; strip & continuations
    vals = re.findall(r"[-+]?\d+\.\d+(?:[dDeE][-+]?\d+)?", body)
    arr = np.array([float(v.lower().replace("d", "e")) for v in vals], dtype=np.float64)
    if arr.size != N:
        raise SystemExit(f"{name}: expected {N} values, got {arr.size}")
    return arr


def main() -> None:
    text = open(SRC).read()
    out = {}
    for fort, key in (("Ttest", "T"), ("v1test", "v1"), ("v2test", "v2")):
        flat = parse_array(text, fort)
        # flat index ind = (k-1)*16 + (j-1)*4 + (i-1)  ->  [k, j, i]
        out[key] = flat.reshape(NLEV, NP, NP)
    np.savez(OUT, **out)
    print(f"wrote {OUT}: " + ", ".join(f"{k}{v.shape}" for k, v in out.items()))


if __name__ == "__main__":
    sys.exit(main())
