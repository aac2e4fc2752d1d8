"""NumPy float64 oracle for compute_and_apply_rhs (CAAR).

Behavioral mirror of the reference's golden Fortran kernel
(/root/reference/compute_and_apply_rhs_test/fortran/routine_mod.F90:7-293),
vectorized over elements/levels/GLL points but keeping Fortran's *order of
floating-point operations* (explicitly unrolled 4-term Dvv contractions,
sequential-order cumulative sums) so results match the golden arrays in
test_mod.F90 to the last bit or near it.

This module is the correctness anchor: every JAX/Pallas implementation is
unit-tested against it.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..config import Config
from ..constants import CONSTANTS
from ..grid import Geometry, HybridVCoord
from ..state import Derived, State


def _dvv_contract_x(dvv: np.ndarray, s: np.ndarray) -> np.ndarray:
    """ds/dx[..., l, j] = sum_i Dvv[i, l] * s[..., i, j], with the reference's
    left-to-right 4-term accumulation (derivative_mod_base.F90:44-55)."""
    # explicit sequential sum to match Fortran rounding
    acc = dvv[0][:, None] * s[..., 0, :][..., None, :]
    for i in range(1, 4):
        acc = acc + dvv[i][:, None] * s[..., i, :][..., None, :]
    return acc


def _dvv_contract_y(dvv: np.ndarray, s: np.ndarray) -> np.ndarray:
    """ds/dy[..., j, l] = sum_i Dvv[i, l] * s[..., j, i] (axis-1 derivative)."""
    acc = dvv[0][None, :] * s[..., :, 0][..., :, None]
    for i in range(1, 4):
        acc = acc + dvv[i][None, :] * s[..., :, i][..., :, None]
    return acc


def gradient_sphere_ref(s, dvv, dinv, rrearth):
    """gradient_sphere (derivative_mod_base.F90:25-65).

    s: [..., np, np]; dinv: broadcastable [..., 2, 2, np, np].
    Returns (ds1, ds2) latlon components.
    """
    v1 = _dvv_contract_x(dvv, s) * rrearth
    v2 = _dvv_contract_y(dvv, s) * rrearth
    ds1 = dinv[..., 0, 0, :, :] * v1 + dinv[..., 1, 0, :, :] * v2
    ds2 = dinv[..., 0, 1, :, :] * v1 + dinv[..., 1, 1, :, :] * v2
    return ds1, ds2


def divergence_sphere_ref(v1, v2, dvv, dinv, metdet, rmetdet, rrearth):
    """divergence_sphere (derivative_mod_base.F90:182-230)."""
    gv1 = metdet * (dinv[..., 0, 0, :, :] * v1 + dinv[..., 0, 1, :, :] * v2)
    gv2 = metdet * (dinv[..., 1, 0, :, :] * v1 + dinv[..., 1, 1, :, :] * v2)
    dudx = _dvv_contract_x(dvv, gv1)
    dvdy = _dvv_contract_y(dvv, gv2)
    return (dudx + dvdy) * (rmetdet * rrearth)


def vorticity_ref(u, v, dvv, d, rmetdet, rrearth):
    """vorticity_v2 (derivative_mod_base.F90:127-177)."""
    vco1 = d[..., 0, 0, :, :] * u + d[..., 1, 0, :, :] * v
    vco2 = d[..., 0, 1, :, :] * u + d[..., 1, 1, :, :] * v
    dvdx = _dvv_contract_x(dvv, vco2)
    dudy = _dvv_contract_y(dvv, vco1)
    return (dvdx - dudy) * (rmetdet * rrearth)


def preq_hydrostatic_ref(phis, t_v, p, dp, rgas):
    """preq_hydrostatic (routine_mod.F90:255-293): reverse vertical scan of
    phii(k) = phii(k+1) + Rgas*T_v*2*hkk; phi(k) = phis + phii(k+1) + Rgas*T_v*hkk.

    Level axis is -3 ([..., nlev, np, np])."""
    hkk = dp * 0.5 / p
    term_full = rgas * t_v * (2.0 * hkk)      # hkl contribution
    term_half = rgas * t_v * hkk
    # phii[k] = sum_{l>=k} term_full[l], sequential from the bottom
    phii = np.flip(np.cumsum(np.flip(term_full, axis=-3), axis=-3), axis=-3)
    phii_below = np.concatenate(
        [phii[..., 1:, :, :], np.zeros_like(phii[..., :1, :, :])], axis=-3
    )
    return phis[..., None, :, :] + phii_below + term_half


def preq_omega_ps_ref(p, vgrad_p, divdp):
    """preq_omega_ps (routine_mod.F90:207-252): forward scan.

    omega_p(k) = vgrad_p/p - ckl*suml_{<k} - ckk*divdp(k), ckk = 0.5/p."""
    ckk = 0.5 / p
    ckl = 2.0 * ckk
    csum = np.cumsum(divdp, axis=-3)
    suml_prev = np.concatenate(
        [np.zeros_like(csum[..., :1, :, :]), csum[..., :-1, :, :]], axis=-3
    )
    return (vgrad_p / p - ckl * suml_prev) - ckk * divdp


def midpoint_pressure_ref(hyai0_ps0, dp):
    """Midpoint pressure scan (routine_mod.F90:72-75):
    p(1) = hyai(1)*ps0 + dp(1)/2; p(k) = (p(k-1) + dp(k-1)/2) + dp(k)/2,
    with Fortran's left-to-right grouping reproduced via an interleaved cumsum."""
    half = dp / 2.0
    a = half[..., :-1, :, :]
    b = half[..., 1:, :, :]
    inter = np.stack([a, b], axis=-3)           # [..., nlev-1, 2, np, np]
    inter = inter.reshape(*inter.shape[:-4], -1, *inter.shape[-2:])
    p0 = hyai0_ps0 + half[..., :1, :, :]
    cs = np.cumsum(np.concatenate([p0, inter], axis=-3), axis=-3)
    return cs[..., 0::2, :, :]


def caar_ref(
    state: State,
    derived: Derived,
    geom: Geometry,
    hv: HybridVCoord,
    cfg: Config,
    dt2: float = 1.0,
    eta_ave_w: float = 1.0,
    moist: bool = True,
):
    """One CAAR evaluation + state update (routine_mod.F90:7-193).

    Mutates nothing; returns (new State, new Derived) with np1 fields replaced
    and derived accumulators advanced. ``moist=False`` corresponds to qn0==-1
    (routine_mod.F90:95-103).
    """
    c = CONSTANTS
    n0, np1, nm1, qn0 = cfg.n0, cfg.np1, cfg.nm1, cfg.qn0
    dvv = geom.dvv
    dinv = geom.dinv[:, None]      # [nelem, 1(lev), 2, 2, np, np]
    d = geom.d[:, None]
    metdet = geom.metdet[:, None]
    rmetdet = geom.rmetdet[:, None]
    rr = c.rrearth

    u = state.u[n0]                # [nelem, nlev, np, np]
    v = state.v[n0]
    t = state.t[n0]
    dp = state.dp3d[n0]

    # 1. midpoint pressure scan (routine_mod.F90:72-75)
    p = midpoint_pressure_ref(hv.hyai[0] * hv.ps0, dp)

    # 2. grad p, v.grad(p), mass flux (routine_mod.F90:79-91)
    grad_p1, grad_p2 = gradient_sphere_ref(p, dvv, dinv, rr)
    vgrad_p = u * grad_p1 + v * grad_p2
    vdp1 = u * dp
    vdp2 = v * dp
    vn0_u = derived.vn0_u + eta_ave_w * vdp1
    vn0_v = derived.vn0_v + eta_ave_w * vdp2

    # 3. divergence of mass flux + vorticity (routine_mod.F90:92-93)
    divdp = divergence_sphere_ref(vdp1, vdp2, dvv, dinv, metdet, rmetdet, rr)
    vort = vorticity_ref(u, v, dvv, d, rmetdet, rr)

    # 4. virtual temperature (routine_mod.F90:95-118)
    if moist:
        qt = state.qdp[qn0, :, 0] / dp
        t_v = t * (1.0 + (c.Rwater_vapor / c.Rgas - 1.0) * qt)
    else:
        t_v = t.copy()
    kappa_star = c.kappa

    # 5. hydrostatic integral -> phi (routine_mod.F90:119, 255-293)
    phi = preq_hydrostatic_ref(state.phis, t_v, p, dp, c.Rgas)

    # 6. omega/p (routine_mod.F90:120, 207-252)
    omega_p = preq_omega_ps_ref(p, vgrad_p, divdp)

    # 7. vertically-Lagrangian: eta_dot_dpdn = T_vadv = v_vadv = 0
    #    accumulate derived (routine_mod.F90:121-136)
    d_omega_p = derived.omega_p + eta_ave_w * omega_p
    d_eta = derived.eta_dot_dpdn  # + eta_ave_w * 0

    # 8. tendencies (routine_mod.F90:140-177)
    e_kin = 0.5 * (u * u + v * v)
    ephi = e_kin + phi + derived.pecnd
    grad_t1, grad_t2 = gradient_sphere_ref(t, dvv, dinv, rr)
    vgrad_t = u * grad_t1 + v * grad_t2
    gephi1, gephi2 = gradient_sphere_ref(ephi, dvv, dinv, rr)
    gpterm = t_v / p
    glnps1 = c.Rgas * gpterm * grad_p1
    glnps2 = c.Rgas * gpterm * grad_p2
    fcor_vort = geom.fcor[:, None] + vort
    vtens1 = v * fcor_vort - gephi1 - glnps1
    vtens2 = -(u * fcor_vort) - gephi2 - glnps2
    ttens = -vgrad_t + kappa_star * t_v * omega_p

    # 9. apply (routine_mod.F90:182-190)
    sph = geom.spheremp[:, None]
    new_u = state.u.copy()
    new_v = state.v.copy()
    new_t = state.t.copy()
    new_dp = state.dp3d.copy()
    new_u[np1] = sph * (state.u[nm1] + dt2 * vtens1)
    new_v[np1] = sph * (state.v[nm1] + dt2 * vtens2)
    new_t[np1] = sph * (state.t[nm1] + dt2 * ttens)
    new_dp[np1] = sph * (state.dp3d[nm1] - dt2 * divdp)

    new_state = dataclasses.replace(
        state, u=new_u, v=new_v, t=new_t, dp3d=new_dp
    )
    new_derived = dataclasses.replace(
        derived, vn0_u=vn0_u, vn0_v=vn0_v, phi=phi,
        omega_p=d_omega_p, eta_dot_dpdn=d_eta,
    )
    return new_state, new_derived
