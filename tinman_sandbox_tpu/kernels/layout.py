"""TPU-native packed layout for the fused CAAR kernel.

The reference explores six array layouts (STVER1-4, level- vs tiled-
vectorized; SURVEY §2) to feed CPU SIMD units. The TPU-native answer is a
single packed layout chosen for the VPU/MXU tile shape (8x128 lanes,
128x128 MXU):

    field[e, k, i, j]  ->  packed[e*16 + (i*4+j), k]      ("[E16, K]")

* GLL points ride the SUBLANE axis, so a block of ``eb`` elements is a
  ``[eb*16, nlev]`` tile — ``eb=8`` gives exactly 128 sublanes.
* The 4x4 Dvv contractions (derivative_mod_base.F90:25-230) become ONE
  128x128 block-diagonal matmul per derivative: ``(I_eb (x) DX16) @ F``
  with ``DX16[l*4+j, i*4+j] = Dvv[i,l]`` — full-width MXU work instead of
  length-4 dot products.
* The three vertical recurrences (routine_mod.F90:72-75, 207-293) become
  triangular-matrix matmuls along the LANE axis: ``F @ A`` with
  ``A[l, k] = [l <= k]`` (and its strict/reversed variants) — log-free,
  bank-conflict-free MXU scans.
* Per-element 2D metric terms pack into one ``[e*16, 16]`` meta array
  broadcast over lanes inside the kernel.
"""
from __future__ import annotations

import numpy as np

from ..config import NP, NPSQ

__all__ = [
    "pack_field",
    "unpack_field",
    "pack_field_t",
    "unpack_field_t",
    "pack_meta",
    "pack_meta_t",
    "block_derivative_ops",
    "scan_matrices",
    "META_COLS",
]

# column order of the packed per-element meta array
META_COLS = (
    "dinv00", "dinv01", "dinv10", "dinv11",
    "d00", "d01", "d10", "d11",
    "metdet", "rmetdet", "fcor", "spheremp",
    "phis", "mp", "pad1", "pad2",
)


def pack_field(x):
    """[..., e, k, np, np] -> [..., e*16, k]."""
    import jax.numpy as jnp

    *lead, e, k, ni, nj = x.shape
    assert ni == NP and nj == NP
    xt = jnp.moveaxis(jnp.asarray(x), -3, -1)          # [..., e, np, np, k]
    return xt.reshape(*lead, e * NPSQ, k)


def unpack_field(x, nelem):
    """[..., e*16, k] -> [..., e, k, np, np]."""
    import jax.numpy as jnp

    *lead, e16, k = x.shape
    assert e16 == nelem * NPSQ
    xt = jnp.asarray(x).reshape(*lead, nelem, NP, NP, k)
    return jnp.moveaxis(xt, -1, -3)


def pack_field_t(x):
    """[..., e, k, np, np] -> [..., k, e*16] (transposed packed layout).

    The "[K, E16]" layout is lane-padding-free on TPU: nlev=72 is an exact
    multiple of the 8-sublane tile and e*16 is a multiple of 128 lanes for
    any e % 8 == 0, whereas "[E16, K]" pads 72 lanes to 128 (1.78x HBM
    footprint and a measured ~1.3x bandwidth penalty on v5e).
    """
    import jax.numpy as jnp

    return jnp.swapaxes(pack_field(x), -1, -2)


def unpack_field_t(x, nelem):
    """[..., k, e*16] -> [..., e, k, np, np]."""
    import jax.numpy as jnp

    return unpack_field(jnp.swapaxes(jnp.asarray(x), -1, -2), nelem)


def pack_meta_t(geom, phis, dtype=None):
    """Transposed pack_meta: [16, e*16] (META_COLS on sublanes)."""
    return pack_meta(geom, phis, dtype).T


def pack_2d(x):
    """[e, np, np] -> [e*16, 1]."""
    import jax.numpy as jnp

    e = x.shape[0]
    return jnp.asarray(x).reshape(e * NPSQ, 1)


def pack_meta(geom, phis, dtype=None):
    """Pack per-element metric terms + phis into [e*16, 16] (META_COLS
    order). Traceable (jnp), so it can live inside jitted loops."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    e = geom.fcor.shape[0]
    cols = {
        "dinv00": geom.dinv[:, 0, 0], "dinv01": geom.dinv[:, 0, 1],
        "dinv10": geom.dinv[:, 1, 0], "dinv11": geom.dinv[:, 1, 1],
        "d00": geom.d[:, 0, 0], "d01": geom.d[:, 0, 1],
        "d10": geom.d[:, 1, 0], "d11": geom.d[:, 1, 1],
        "metdet": geom.metdet, "rmetdet": geom.rmetdet,
        "fcor": geom.fcor, "spheremp": geom.spheremp,
        "phis": phis, "mp": geom.mp,
    }
    zeros = jnp.zeros((e * NPSQ,), dtype)
    stacked = [
        jnp.asarray(cols[name], dtype).reshape(e * NPSQ)
        if name in cols else zeros
        for name in META_COLS
    ]
    return jnp.stack(stacked, axis=1)


def block_derivative_ops(eb: int, dvv, dtype=np.float32):
    """(DXB, DYB): [eb*16, eb*16] block-diagonal derivative operators.

    DX16[l*4+j, i*4+j] = Dvv[i, l]  =>  DX16 = Dvv^T (x) I_4
    DY16[i*4+l, i*4+j] = Dvv[j, l]  =>  DY16 = I_4 (x) Dvv^T
    so that (I_eb (x) OP16) @ F reproduces ops/sphere._dx/_dy on the packed
    layout. Traceable (jnp) so geometry can stay a jit argument.
    """
    import jax.numpy as jnp

    dvv_t = jnp.asarray(dvv, dtype).T
    eye4 = jnp.eye(NP, dtype=dtype)
    eyeb = jnp.eye(eb, dtype=dtype)
    dx16 = jnp.kron(dvv_t, eye4)
    dy16 = jnp.kron(eye4, dvv_t)
    return jnp.kron(eyeb, dx16), jnp.kron(eyeb, dy16)


def scan_matrices(nlev: int, dtype=np.float32):
    """(A_inc, A_strict, B_strict): [nlev, nlev] lane-axis scan operators.

    For F of shape [rows, nlev]:
      (F @ A_inc)[:, k]    = sum_{l<=k} F[:, l]   (forward inclusive)
      (F @ A_strict)[:, k] = sum_{l<k}  F[:, l]   (forward exclusive)
      (F @ B_strict)[:, k] = sum_{l>k}  F[:, l]   (reverse exclusive)
    """
    l = np.arange(nlev)[:, None]
    k = np.arange(nlev)[None, :]
    a_inc = (l <= k).astype(dtype)
    a_strict = (l < k).astype(dtype)
    b_strict = (l > k).astype(dtype)
    return a_inc, a_strict, b_strict
