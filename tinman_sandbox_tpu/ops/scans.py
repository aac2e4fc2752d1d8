"""Vertical recurrences as cumulative sums (JAX/XLA path).

The reference implements these as serial per-column scans carrying values
across SIMD-pack boundaries (CaarFunctor.hpp:197-322). The fused Fortran
variant (routine_st_fused.F90:206,251-272) proves all three are affine in
prefix sums, which is the TPU-native form used here: XLA lowers cumsum to a
log-depth scan (and the Pallas kernels lower it to a triangular matmul on
the MXU).

Level axis is -3 throughout ([..., nlev, np, np]).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["midpoint_pressure", "preq_hydrostatic", "preq_omega_ps"]


def midpoint_pressure(hyai0_ps0, dp):
    """Midpoint pressure (routine_mod.F90:72-75):
    p(k) = hyai(1)*ps0 + cumsum(dp)(k) - dp(k)/2."""
    return hyai0_ps0 + jnp.cumsum(dp, axis=-3) - dp * 0.5


def preq_hydrostatic(phis, t_v, p, dp, rgas):
    """Geopotential by reverse vertical integral (routine_mod.F90:255-293):
    phi(k) = phis + revcumsum_{l>k}(q(l)) + q(k)/2, q = Rgas*T_v*dp/p."""
    q = rgas * t_v * (dp / p)
    # inclusive reverse cumsum minus self = strict sum over l > k
    rev = jnp.flip(jnp.cumsum(jnp.flip(q, axis=-3), axis=-3), axis=-3)
    return phis[..., None, :, :] + (rev - q) + 0.5 * q


def preq_omega_ps(p, vgrad_p, divdp):
    """Omega/p diagnostic by forward scan (routine_mod.F90:207-252):
    omega_p(k) = (vgrad_p(k) - cumsum_{l<k}(divdp) - divdp(k)/2) / p(k)."""
    csum = jnp.cumsum(divdp, axis=-3) - divdp   # exclusive prefix
    return (vgrad_p - csum - 0.5 * divdp) / p
