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

__all__ = [
    "midpoint_pressure",
    "preq_hydrostatic",
    "preq_omega_ps",
    "eta_dot_dpdn_rsplit0",
    "preq_vertadv",
]


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


def eta_dot_dpdn_rsplit0(divdp, hybi):
    """Interface vertical mass flux for the non-Lagrangian (rsplit=0) path
    (routine_extracted.F90:224-254):
      eta(k+1) = hybi(k+1) * sum_l(divdp) - cumsum(divdp)(k),  eta(1)=eta(nlev+1)=0.

    Returns (eta [..., nlev+1, np, np], sdot_sum [..., 1, np, np])."""
    cum = jnp.cumsum(divdp, axis=-3)
    sdot_sum = cum[..., -1:, :, :]
    hybi_in = jnp.asarray(hybi, divdp.dtype)[1:-1]
    inner = hybi_in[:, None, None] * sdot_sum - cum[..., :-1, :, :]
    zero = jnp.zeros_like(sdot_sum)
    return jnp.concatenate([zero, inner, zero], axis=-3), sdot_sum


def preq_vertadv(t, u, v, eta, rpdel):
    """Vertical advection tendencies (CaarFunctor.hpp:504-547,
    routine_extracted.F90:258-260):
      facp(k) = 0.5*rpdel(k)*eta(k+1),  facm(k) = 0.5*rpdel(k)*eta(k)
      X_vadv(k) = facp*(X(k+1)-X(k)) + facm*(X(k)-X(k-1))
    with the facm term absent at the top level and facp at the bottom.

    eta is [..., nlev+1, np, np] interface flux. Returns (t_vadv, u_vadv,
    v_vadv)."""
    facp = 0.5 * rpdel * eta[..., 1:, :, :]     # eta(k+1), zero at bottom
    facm = 0.5 * rpdel * eta[..., :-1, :, :]    # eta(k),   zero at top

    def vadv(x):
        dxp = jnp.diff(x, axis=-3)              # x(k+1) - x(k), length nlev-1
        zero = jnp.zeros_like(x[..., :1, :, :])
        up = jnp.concatenate([dxp, zero], axis=-3)      # facp pairs
        dn = jnp.concatenate([zero, dxp], axis=-3)      # facm pairs
        return facp * up + facm * dn

    return vadv(t), vadv(u), vadv(v)
