"""Element geometry, the GLL derivative matrix, and deterministic initializers.

Array conventions (used framework-wide):
  * GLL fields carry trailing axes ``[..., i, j]`` where ``i``/``j`` are the
    Fortran first/second GLL indices (0-based). A scalar element field is
    ``[nelem, nlev, np, np]``.
  * 2x2 tensors are stored ``[nelem, 2, 2, np, np]`` with ``D[e, a, b, i, j]``
    equal to the reference's ``D(i,j,a,b)``
    (/root/reference/compute_and_apply_rhs_test/fortran/element_mod.F90:244-268).
  * ``Dvv[i, l]`` matches the reference's ``deriv%Dvv(i,l)``
    (fortran/main.F90:87-96): the covariant derivative along an element axis is
    ``d/dx s (l, j) = sum_i Dvv[i, l] * s[i, j]``.

The Dvv values are intentionally the single-precision-truncated constants the
reference uses (fortran/main.F90:83-86) — the golden outputs were generated
from them.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np

from .config import NP, Config


# fortran/main.F90:87-90 — column-major list, Dvv(i,j) = Dvv_init[(j-1)*np+i]
_DVV_INIT = [
    -3.0, -0.80901699437494745, 0.30901699437494745, -0.5,
    4.0450849718747373, 0.0, -1.1180339887498949, 1.5450849718747370,
    -1.5450849718747370, 1.1180339887498949, 0.0, -4.0450849718747373,
    0.5, -0.30901699437494745, 0.80901699437494745, 3.0,
]


def dvv_matrix(dtype=np.float64) -> np.ndarray:
    """The 4x4 GLL pseudo-spectral derivative matrix, indexed Dvv[i, l]."""
    return np.asarray(_DVV_INIT, dtype=dtype).reshape(NP, NP).T.copy()


# GLL quadrature weights on [-1, 1] for np=4 (HOMME standard); used by the
# weak-form/testcov operators which need mp/metdet (SphereOperators.hpp:493+).
GLL_WEIGHTS_NP4 = np.array(
    [1.0 / 6.0, 5.0 / 6.0, 5.0 / 6.0, 1.0 / 6.0], dtype=np.float64
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Geometry:
    """Per-element metric terms (element_mod.F90:244-268) + the Dvv operator."""

    dvv: Any          # [np, np]        Dvv[i, l]
    fcor: Any         # [nelem, np, np] Coriolis
    metdet: Any       # [nelem, np, np] |g| metric determinant
    rmetdet: Any      # [nelem, np, np] 1/metdet
    spheremp: Any     # [nelem, np, np] spectral mass matrix
    rspheremp: Any    # [nelem, np, np] 1/DSS(spheremp) (assembled inverse mass)
    d: Any            # [nelem, 2, 2, np, np]  map covariant->latlon
    dinv: Any         # [nelem, 2, 2, np, np]  inverse map
    mp: Any           # [nelem, np, np] reference-element mass (GLL weight products)
    metinv: Any       # [nelem, 2, 2, np, np] inverse covariant metric (D^T D)^-1
    vec_sph2cart: Any  # [nelem, 2, 3, np, np] latlon->cartesian map

    @property
    def nelem(self) -> int:
        return self.fcor.shape[0]

    def astype(self, dtype) -> "Geometry":
        return Geometry(**{
            f.name: getattr(self, f.name).astype(dtype)
            for f in dataclasses.fields(self)
        })


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HybridVCoord:
    """Hybrid vertical coordinate (hybvcoord_mod.F90:17-29).

    Only ps0 and hyai[0] feed CAAR (SURVEY §2.1); the rest is kept for parity.
    """
    ps0: float
    hyai: Any         # [nlev+1]
    hybi: Any         # [nlev+1]
    hyam: Any         # [nlev]
    hybm: Any         # [nlev]

    def astype(self, dtype) -> "HybridVCoord":
        return HybridVCoord(
            ps0=self.ps0,
            hyai=self.hyai.astype(dtype),
            hybi=self.hybi.astype(dtype),
            hyam=self.hyam.astype(dtype),
            hybm=self.hybm.astype(dtype),
        )


def _metinv_from_d(d: np.ndarray) -> np.ndarray:
    """Inverse covariant metric (met = D^T D, metinv = met^-1), consistent with
    HOMME's element metric terms (element_mod.F90:244-250)."""
    m00 = d[:, 0, 0] * d[:, 0, 0] + d[:, 1, 0] * d[:, 1, 0]
    m01 = d[:, 0, 0] * d[:, 0, 1] + d[:, 1, 0] * d[:, 1, 1]
    m11 = d[:, 0, 1] * d[:, 0, 1] + d[:, 1, 1] * d[:, 1, 1]
    det = m00 * m11 - m01 * m01
    metinv = np.empty_like(d)
    metinv[:, 0, 0] = m11 / det
    metinv[:, 1, 1] = m00 / det
    metinv[:, 0, 1] = -m01 / det
    metinv[:, 1, 0] = -m01 / det
    return metinv


def _analytic_vec_sph2cart(nelem: int) -> np.ndarray:
    """Deterministic latlon->cartesian map for operator tests; the reference
    never initializes vec_sphere2cart (element_mod.F90:268 is unused), so any
    smooth nondegenerate choice is valid for parity testing."""
    i = np.arange(1, NP + 1, dtype=np.float64)
    ii = i[:, None] * np.ones((1, NP))
    jj = np.ones((NP, 1)) * i[None, :]
    v = np.empty((nelem, 2, 3, NP, NP), dtype=np.float64)
    v[:, 0, 0] = np.cos(ii)
    v[:, 0, 1] = np.sin(ii + jj)
    v[:, 0, 2] = 0.25 * jj
    v[:, 1, 0] = -np.sin(jj)
    v[:, 1, 1] = np.cos(ii - jj)
    v[:, 1, 2] = 0.5 * ii
    return v


def analytic_geometry(cfg: Config, dtype=np.float64) -> Geometry:
    """The reference's deterministic analytic metric init (main.F90:103-124,
    duplicated in cxx/basic/data_structures.cpp:42-92). 1-based i, j, ie."""
    nelem = cfg.nelem
    i = np.arange(1, NP + 1, dtype=np.float64)
    ii = i[:, None] * np.ones((1, NP))          # [i, j] grid of i values
    jj = np.ones((NP, 1)) * i[None, :]

    fcor = np.broadcast_to(np.sin(ii + jj), (nelem, NP, NP)).astype(dtype)
    metdet = np.broadcast_to(ii * jj, (nelem, NP, NP)).astype(dtype)
    rmetdet = (1.0 / metdet).astype(dtype)
    spheremp = np.broadcast_to(2.0 * ii, (nelem, NP, NP)).astype(dtype)

    d = np.zeros((nelem, 2, 2, NP, NP), dtype=dtype)
    dinv = np.zeros((nelem, 2, 2, NP, NP), dtype=dtype)
    d[:, 0, 0] = 1.0
    d[:, 1, 1] = 2.0
    dinv[:, 0, 0] = 1.0
    dinv[:, 1, 1] = 0.5

    mp = np.broadcast_to(
        GLL_WEIGHTS_NP4[:, None] * GLL_WEIGHTS_NP4[None, :], (nelem, NP, NP)
    ).astype(dtype)

    return Geometry(
        dvv=dvv_matrix(dtype),
        fcor=fcor,
        metdet=metdet,
        rmetdet=rmetdet,
        spheremp=spheremp,
        rspheremp=(1.0 / spheremp).astype(dtype),
        d=d,
        dinv=dinv,
        mp=mp,
        metinv=_metinv_from_d(d).astype(dtype),
        vec_sph2cart=_analytic_vec_sph2cart(nelem).astype(dtype),
    )


def analytic_hvcoord(cfg: Config, dtype=np.float64) -> HybridVCoord:
    """Reference hvcoord init: ps0=10, hyai(k) = nlev+2-k (main.F90:159-162)."""
    nlev = cfg.nlev
    k = np.arange(1, nlev + 2, dtype=np.float64)
    hyai = (nlev + 2 - k).astype(dtype)
    hybi = np.zeros(nlev + 1, dtype=dtype)
    return HybridVCoord(
        ps0=10.0,
        hyai=hyai,
        hybi=hybi,
        hyam=0.5 * (hyai[:-1] + hyai[1:]),
        hybm=0.5 * (hybi[:-1] + hybi[1:]),
    )


def random_geometry(cfg: Config, seed: int = 0, dtype=np.float64) -> Geometry:
    """Random-but-well-conditioned metric init, mirroring the performance
    suite's seeded init (level_vectorized_ppscan/Elements.cpp:101-151):
    D is random with |det| >= 1/64; Dinv is its exact inverse."""
    rng = np.random.default_rng(seed)
    nelem = cfg.nelem

    def randf(*shape, lo=0.5, hi=2.0):
        return rng.uniform(lo, hi, shape)

    d = rng.uniform(-1.0, 1.0, (nelem, 2, 2, NP, NP))
    det = d[:, 0, 0] * d[:, 1, 1] - d[:, 0, 1] * d[:, 1, 0]
    # resample entries where |det| < 1/64 by inflating the diagonal
    bad = np.abs(det) < (1.0 / 64.0)
    d[:, 0, 0] = np.where(bad, d[:, 0, 0] + 1.0, d[:, 0, 0])
    d[:, 1, 1] = np.where(bad, d[:, 1, 1] + 1.0, d[:, 1, 1])
    det = d[:, 0, 0] * d[:, 1, 1] - d[:, 0, 1] * d[:, 1, 0]
    dinv = np.empty_like(d)
    dinv[:, 0, 0] = d[:, 1, 1] / det
    dinv[:, 1, 1] = d[:, 0, 0] / det
    dinv[:, 0, 1] = -d[:, 0, 1] / det
    dinv[:, 1, 0] = -d[:, 1, 0] / det

    metdet = randf(nelem, NP, NP)
    spheremp = randf(nelem, NP, NP)
    mp = np.broadcast_to(
        GLL_WEIGHTS_NP4[:, None] * GLL_WEIGHTS_NP4[None, :], (nelem, NP, NP)
    ).copy()

    return Geometry(
        dvv=dvv_matrix(np.float64),
        fcor=randf(nelem, NP, NP, lo=-1.0, hi=1.0),
        metdet=metdet,
        rmetdet=1.0 / metdet,
        spheremp=spheremp,
        rspheremp=1.0 / spheremp,
        d=d,
        dinv=dinv,
        mp=mp,
        metinv=_metinv_from_d(d),
        vec_sph2cart=rng.uniform(-1.0, 1.0, (nelem, 2, 3, NP, NP)),
    ).astype(dtype)
