"""Unit tests for the batched JAX sphere operators and vertical scans.

Strategy (SURVEY §4 implication d): each operator is checked against the
NumPy f64 oracle and/or a defining mathematical identity (discrete adjoint,
product rule) that holds for arbitrary metric terms.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from tinman_sandbox_tpu import CONSTANTS, Config, random_geometry, random_state
from tinman_sandbox_tpu.ops import (
    curl_sphere_wk_testcov,
    divergence_sphere,
    divergence_sphere_update,
    divergence_sphere_wk,
    grad_sphere_wk_testcov,
    gradient_sphere,
    gradient_sphere_update,
    laplace_simple,
    laplace_tensor,
    midpoint_pressure,
    preq_hydrostatic,
    preq_omega_ps,
    laplace_tensor_replace,
    virtual_temperature,
    vlaplace_sphere_wk_cartesian,
    vlaplace_sphere_wk_cartesian_reduced,
    vlaplace_sphere_wk_contra,
    vorticity_sphere,
    vorticity_sphere_vector,
)
from tinman_sandbox_tpu.ref.caar_ref import (
    divergence_sphere_ref,
    gradient_sphere_ref,
    midpoint_pressure_ref,
    preq_hydrostatic_ref,
    preq_omega_ps_ref,
    vorticity_ref,
)

RR = CONSTANTS.rrearth
CFG = Config(nelem=6, nlev=16)
GEOM = random_geometry(CFG, seed=7)
RNG = np.random.default_rng(42)


def field(*batch):
    return RNG.uniform(-1.0, 1.0, (*batch, CFG.nelem, CFG.nlev, 4, 4))


def _geo_lev(arr):
    """Add a broadcast level axis to a per-element geometry array."""
    return arr[:, None]


class TestStrongOps:
    def setup_method(self, _):
        self.s = field()
        self.v1 = field()
        self.v2 = field()
        self.dinv = _geo_lev(GEOM.dinv)
        self.d = _geo_lev(GEOM.d)
        self.metdet = _geo_lev(GEOM.metdet)
        self.rmetdet = _geo_lev(GEOM.rmetdet)

    def test_gradient_matches_oracle(self):
        g1, g2 = gradient_sphere(self.s, GEOM.dvv, self.dinv, RR)
        r1, r2 = gradient_sphere_ref(self.s, GEOM.dvv, self.dinv, RR)
        np.testing.assert_allclose(g1, r1, rtol=1e-13, atol=1e-18)
        np.testing.assert_allclose(g2, r2, rtol=1e-13, atol=1e-18)

    def test_divergence_matches_oracle(self):
        d = divergence_sphere(self.v1, self.v2, GEOM.dvv, self.dinv,
                              self.metdet, self.rmetdet, RR)
        r = divergence_sphere_ref(self.v1, self.v2, GEOM.dvv, self.dinv,
                                  self.metdet, self.rmetdet, RR)
        np.testing.assert_allclose(d, r, rtol=1e-12, atol=1e-18)

    def test_vorticity_matches_oracle(self):
        w = vorticity_sphere(self.v1, self.v2, GEOM.dvv, self.d, self.rmetdet, RR)
        wv = vorticity_sphere_vector(
            jnp.stack([jnp.asarray(self.v1), jnp.asarray(self.v2)], axis=-3),
            GEOM.dvv, self.d, self.rmetdet, RR,
        )
        np.testing.assert_array_equal(np.asarray(w), np.asarray(wv))
        r = vorticity_ref(self.v1, self.v2, GEOM.dvv, self.d, self.rmetdet, RR)
        np.testing.assert_allclose(w, r, rtol=1e-12, atol=1e-18)

    def test_dvv_annihilates_constants_in_row_direction(self):
        """The reference's hardcoded Dvv (main.F90:87-96) has zero ROW sums
        (sum_l Dvv[i,l] = 0), i.e. the values are stored transposed relative
        to the textbook GLL differentiation matrix: contracting a constant
        with dvv.T gives exactly zero, while the reference's own contraction
        direction does not (a sandbox quirk the golden values bake in)."""
        np.testing.assert_allclose(np.sum(GEOM.dvv, axis=1), 0.0, atol=1e-15)
        g1, g2 = gradient_sphere(
            jnp.ones_like(self.s), GEOM.dvv.T, self.dinv, RR
        )
        np.testing.assert_allclose(g1, 0.0, atol=1e-18)
        np.testing.assert_allclose(g2, 0.0, atol=1e-18)

    def test_vorticity_of_gradient_is_zero(self):
        """curl(grad(s)) == 0 requires D = (Dinv)^-1; random_geometry's D/Dinv
        are exact inverses."""
        g1, g2 = gradient_sphere(self.s, GEOM.dvv, self.dinv, RR)
        w = vorticity_sphere(g1, g2, GEOM.dvv, self.d, self.rmetdet, RR)
        assert np.max(np.abs(w)) < 1e-12 * np.max(np.abs(g1)) / RR

    def test_update_variants(self):
        a1, a2 = field(), field()
        g1, g2 = gradient_sphere(self.s, GEOM.dvv, self.dinv, RR)
        u1, u2 = gradient_sphere_update(self.s, GEOM.dvv, self.dinv, RR, a1, a2)
        np.testing.assert_allclose(u1, a1 + g1, rtol=1e-13)
        np.testing.assert_allclose(u2, a2 + g2, rtol=1e-13)

        div = divergence_sphere(self.v1, self.v2, GEOM.dvv, self.dinv,
                                self.metdet, self.rmetdet, RR)
        acc = field()
        upd = divergence_sphere_update(self.v1, self.v2, -0.25, 2.0, acc,
                                       GEOM.dvv, self.dinv, self.metdet,
                                       self.rmetdet, RR)
        np.testing.assert_allclose(upd, 2.0 * acc - 0.25 * div, rtol=1e-12)


class TestWeakOps:
    """Weak forms are validated by their defining adjoint identities, which
    hold for arbitrary spheremp/Dinv — independent of index-convention
    bookkeeping."""

    def setup_method(self, _):
        self.phi = field()
        self.v1 = field()
        self.v2 = field()
        self.dinv = _geo_lev(GEOM.dinv)
        self.d = _geo_lev(GEOM.d)
        self.sph = _geo_lev(GEOM.spheremp)
        self.mp = _geo_lev(GEOM.mp)
        self.metinv = _geo_lev(GEOM.metinv)
        self.metdet = _geo_lev(GEOM.metdet)

    def test_divergence_wk_adjoint_identity(self):
        """<grad(phi), v>_spheremp = -<phi, div_wk(v)> (integration by parts,
        SphereOperators.hpp:493-534)."""
        g1, g2 = gradient_sphere(self.phi, GEOM.dvv, self.dinv, RR)
        dwk = divergence_sphere_wk(self.v1, self.v2, GEOM.dvv, self.dinv,
                                   self.sph, RR)
        lhs = np.sum(self.sph * (g1 * self.v1 + g2 * self.v2), axis=(-1, -2))
        rhs = -np.sum(np.asarray(self.phi) * np.asarray(dwk), axis=(-1, -2))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-11, atol=1e-16)

    def test_laplace_simple_is_divwk_of_grad(self):
        lap = laplace_simple(self.phi, GEOM.dvv, self.dinv, self.sph, RR)
        g1, g2 = gradient_sphere(self.phi, GEOM.dvv, self.dinv, RR)
        ref = divergence_sphere_wk(g1, g2, GEOM.dvv, self.dinv, self.sph, RR)
        np.testing.assert_allclose(lap, ref, rtol=1e-13)

    def test_laplace_simple_negative_semidefinite(self):
        """<phi, laplace(phi)> = -<grad phi, grad phi>_spheremp <= 0 for
        positive spheremp."""
        lap = laplace_simple(self.phi, GEOM.dvv, self.dinv, self.sph, RR)
        quad = np.sum(np.asarray(self.phi) * np.asarray(lap), axis=(-1, -2))
        assert np.all(quad <= 1e-18)

    def test_laplace_tensor_identity_visc_reduces_to_simple(self):
        eye = np.zeros((CFG.nelem, 1, 2, 2, 4, 4))
        eye[:, :, 0, 0] = 1.0
        eye[:, :, 1, 1] = 1.0
        lt = laplace_tensor(self.phi, GEOM.dvv, self.dinv, self.sph, eye, RR)
        ls = laplace_simple(self.phi, GEOM.dvv, self.dinv, self.sph, RR)
        np.testing.assert_allclose(lt, ls, rtol=1e-13, atol=1e-18)

    def test_curl_wk_testcov_adjoint_identity(self):
        """<curl_wk(s), v> = <s, vort(v)>_mp-metdet: curl_sphere_wk_testcov is
        the adjoint of the strong vorticity under the mp inner product.

        vort = (1/metdet)*rr*(curl contractions of D.v); curl_wk pairs with
        test functions weighted mp, so sum_ij curl_wk(s).v = sum_ij
        mp*metdet*s*vort(v) ... with metdet absorbed: identity below."""
        c1, c2 = curl_sphere_wk_testcov(self.phi, GEOM.dvv, self.d, self.mp, RR)
        w = vorticity_sphere(self.v1, self.v2, GEOM.dvv, self.d,
                             _geo_lev(GEOM.rmetdet), RR)
        lhs = np.sum(np.asarray(c1) * self.v1 + np.asarray(c2) * self.v2,
                     axis=(-1, -2))
        rhs = np.sum(self.mp * self.metdet * np.asarray(self.phi) * np.asarray(w),
                     axis=(-1, -2))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-11, atol=1e-16)

    def test_grad_wk_testcov_adjoint_identity(self):
        """<grad_wk_testcov(s), v> = -<s, div(v)>_mp-metdet."""
        g1, g2 = grad_sphere_wk_testcov(self.phi, GEOM.dvv, self.d, self.mp,
                                        self.metinv, self.metdet, RR)
        dv = divergence_sphere(self.v1, self.v2, GEOM.dvv, self.dinv,
                               self.metdet, _geo_lev(GEOM.rmetdet), RR)
        lhs = np.sum(np.asarray(g1) * self.v1 + np.asarray(g2) * self.v2,
                     axis=(-1, -2))
        rhs = -np.sum(self.mp * self.metdet * np.asarray(self.phi) * np.asarray(dv),
                      axis=(-1, -2))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-11, atol=1e-16)

    def test_vlaplace_contra_runs_and_damps(self):
        """vlaplace (minus rigid-rotation term) is negative semidefinite in the
        energy inner product <v, L v>."""
        l1, l2 = vlaplace_sphere_wk_contra(
            self.v1, self.v2, GEOM.dvv, self.d, self.dinv, self.mp, self.sph,
            self.metinv, self.metdet, _geo_lev(GEOM.rmetdet), RR, nu_ratio=1.0,
        )
        rigid = 2.0 * self.sph * RR * RR
        quad = np.sum(
            self.v1 * (np.asarray(l1) - rigid * self.v1)
            + self.v2 * (np.asarray(l2) - rigid * self.v2),
            axis=(-1, -2),
        )
        assert np.all(quad <= 1e-16)

    def test_vlaplace_cartesian_negative_semidefinite(self):
        """The FULL cartesian variant (hpp:777-844, no rigid term) is a sum
        of three scalar weak Laplacians in the cartesian components, hence
        <v, L v> <= 0 for identity viscosity."""
        eye = np.zeros((CFG.nelem, 1, 2, 2, 4, 4))
        eye[:, :, 0, 0] = 1.0
        eye[:, :, 1, 1] = 1.0
        l1, l2 = vlaplace_sphere_wk_cartesian(
            self.v1, self.v2, GEOM.dvv, self.dinv, self.sph, eye,
            _geo_lev(GEOM.vec_sph2cart), RR,
        )
        assert l1.shape == self.v1.shape
        quad = np.sum(self.v1 * np.asarray(l1) + self.v2 * np.asarray(l2),
                      axis=(-1, -2))
        assert np.all(quad <= 1e-16)

    def test_vlaplace_cartesian_reduced_is_full_plus_rigid(self):
        """hpp:849-935 = hpp:777-844 + the UNDAMPRRCART term
        2*spheremp*rrearth^2*v (the component Laplacians are the same math
        through laplace_tensor vs laplace_tensor_replace)."""
        visc = RNG.uniform(0.5, 1.5, (CFG.nelem, 1, 2, 2, 4, 4))
        args = (GEOM.dvv, self.dinv, self.sph, visc,
                _geo_lev(GEOM.vec_sph2cart), RR)
        f1, f2 = vlaplace_sphere_wk_cartesian(self.v1, self.v2, *args)
        r1, r2 = vlaplace_sphere_wk_cartesian_reduced(self.v1, self.v2, *args)
        rigid = 2.0 * self.sph * RR * RR
        np.testing.assert_allclose(np.asarray(r1),
                                   np.asarray(f1) + rigid * self.v1,
                                   rtol=1e-12, atol=1e-18)
        np.testing.assert_allclose(np.asarray(r2),
                                   np.asarray(f2) + rigid * self.v2,
                                   rtol=1e-12, atol=1e-18)

    def test_laplace_tensor_replace_matches_tensor(self):
        """hpp:600-638 differs from hpp:555-596 only in buffer aliasing,
        which has no functional analog — outputs must be identical, also for
        non-symmetric viscosity tensors."""
        visc = RNG.uniform(-1.0, 1.0, (CFG.nelem, 1, 2, 2, 4, 4))
        a = laplace_tensor(self.phi, GEOM.dvv, self.dinv, self.sph, visc, RR)
        b = laplace_tensor_replace(self.phi, GEOM.dvv, self.dinv, self.sph,
                                   visc, RR)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_laplace_tensor_transposed_contraction(self):
        """The reference contracts tensorVisc TRANSPOSED (hpp:576-579:
        buf_a = sum_b V[b,a] grad_b); verify against an explicit einsum."""
        visc = RNG.uniform(-1.0, 1.0, (CFG.nelem, 1, 2, 2, 4, 4))
        g1, g2 = gradient_sphere(self.phi, GEOM.dvv, self.dinv, RR)
        g = np.stack([np.asarray(g1), np.asarray(g2)], axis=-3)  # [...,2,np,np]
        tv = np.einsum("...baij,...bij->...aij", visc, g)
        expect = divergence_sphere_wk(tv[..., 0, :, :], tv[..., 1, :, :],
                                      GEOM.dvv, self.dinv, self.sph, RR)
        got = laplace_tensor(self.phi, GEOM.dvv, self.dinv, self.sph, visc, RR)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                                   rtol=1e-12, atol=1e-18)


class TestScans:
    def setup_method(self, _):
        st = random_state(CFG, seed=3)
        self.dp = np.asarray(st.dp3d[0])
        self.tv = np.asarray(st.t[0])
        self.phis = np.asarray(st.phis)
        self.vgp = field()
        self.div = field()
        self.p0 = 73.0 * 10.0

    def test_midpoint_pressure(self):
        p = midpoint_pressure(self.p0, self.dp)
        r = midpoint_pressure_ref(self.p0, self.dp)
        np.testing.assert_allclose(p, r, rtol=1e-13)

    def test_hydrostatic(self):
        p = np.asarray(midpoint_pressure(self.p0, self.dp))
        phi = preq_hydrostatic(self.phis, self.tv, p, self.dp, CONSTANTS.Rgas)
        r = preq_hydrostatic_ref(self.phis, self.tv, p, self.dp, CONSTANTS.Rgas)
        np.testing.assert_allclose(phi, r, rtol=1e-11)

    def test_omega(self):
        p = np.asarray(midpoint_pressure(self.p0, self.dp))
        om = preq_omega_ps(p, self.vgp, self.div)
        r = preq_omega_ps_ref(p, self.vgp, self.div)
        np.testing.assert_allclose(om, r, rtol=1e-10, atol=1e-15)

    def test_virtual_temperature(self):
        q = RNG.uniform(0, 1, self.dp.shape)
        tv = virtual_temperature(self.tv, q, self.dp, CONSTANTS.rgas_over_rvap_m1)
        ref = self.tv * (1 + (CONSTANTS.Rwater_vapor / CONSTANTS.Rgas - 1) * q / self.dp)
        np.testing.assert_allclose(tv, ref, rtol=1e-14)
