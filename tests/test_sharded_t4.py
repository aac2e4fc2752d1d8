"""Face-sharded packed assembled step == single-device packed step.

The multi-chip fast path (dist/sharded_t4.py) must reproduce the
single-chip stacked-state assembled step exactly (same kernels, the only
difference is the all-gathered compact line exchange)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tinman_sandbox_tpu import (
    Config, analytic_hvcoord, random_state, zero_derived,
)
from tinman_sandbox_tpu.dist import build_cubed_sphere
from tinman_sandbox_tpu.dist.sharded_t4 import (
    caar_dss_sharded_t4, make_face_mesh,
)
from tinman_sandbox_tpu.dist.step_pallas import caar_dss_structured_packed_t4
from tinman_sandbox_tpu.dist.structured_dss import make_structured_plan
from tinman_sandbox_tpu.kernels.caar_pallas import _scalars
from tinman_sandbox_tpu.kernels.caar_pallas_t import pack_problem_t


def _setup(ne, nlev, eb):
    cs = build_cubed_sphere(ne)
    cfg = Config(nelem=cs.nelem, nlev=nlev, elem_block=eb)
    cast = lambda t: jax.tree.map(lambda x: np.asarray(x, np.float32), t)
    st = cast(random_state(cfg, seed=8))
    dv = cast(zero_derived(cfg))
    hv = analytic_hvcoord(cfg).astype(np.float32)
    g = cast(cs.geometry)
    plan = make_structured_plan(cs.gdof, ne)
    pt = pack_problem_t(st, dv, g, hv, cfg)
    scal = _scalars(0.5, 1.0, hv)
    rsp = jnp.asarray(g.rspheremp, jnp.float32).reshape(1, -1)
    s0 = jnp.concatenate([pt["u0"], pt["v0"], pt["t0"], pt["dp0"]], axis=0)
    sm1 = jnp.concatenate([pt["um1"], pt["vm1"], pt["tm1"], pt["dpm1"]],
                          axis=0)
    return cs, cfg, plan, pt, scal, rsp, s0, sm1


@pytest.mark.parametrize("ne,nshards,eb", [(2, 6, 4), (4, 3, 4), (4, 2, 4)])
def test_sharded_t4_matches_single_device(ne, nshards, eb):
    if len(jax.devices()) < nshards:
        pytest.skip("needs %d devices" % nshards)
    cs, cfg, plan, pt, scal, rsp, s0, sm1 = _setup(ne, nlev=4, eb=eb)

    ref = caar_dss_structured_packed_t4(
        scal, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"], pt["bstrt"],
        pt["meta"], s0, sm1, pt["qdp"], pt["pecnd"],
        pt["vn0u"], pt["vn0v"], pt["omg"], plan, rsp,
        eb=eb, nlev=4, interpret=True)

    mesh = make_face_mesh(n=nshards)
    with mesh:
        got = caar_dss_sharded_t4(
            scal, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"],
            pt["bstrt"], pt["meta"], s0, sm1, pt["qdp"], pt["pecnd"],
            pt["vn0u"], pt["vn0v"], pt["omg"], plan, rsp, mesh,
            eb=eb, nlev=4, interpret=True)

    names = ("assembled", "phi", "vn0u", "vn0v", "omg")
    for name, a, b in zip(names, got, (ref[0],) + tuple(ref[1:])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6, err_msg=name)


from tinman_sandbox_tpu.dist.banded_t4 import caar_dss_banded_t4
from jax.sharding import Mesh


@pytest.mark.parametrize("ne,m,nshards,eb", [
    (4, 2, 2, 4), (4, 2, 4, 4), (4, 2, 6, 4), (8, 4, 8, 4),
])
def test_banded_t4_matches_single_device(ne, m, nshards, eb):
    """Band-sharded step (element-row bands, halo-row ppermute + compact
    line all_gather) == single-device packed step."""
    if len(jax.devices()) < nshards:
        pytest.skip("needs %d devices" % nshards)
    cs, cfg, plan, pt, scal, rsp, s0, sm1 = _setup(ne, nlev=4, eb=eb)

    ref = caar_dss_structured_packed_t4(
        scal, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"], pt["bstrt"],
        pt["meta"], s0, sm1, pt["qdp"], pt["pecnd"],
        pt["vn0u"], pt["vn0v"], pt["omg"], plan, rsp,
        eb=eb, nlev=4, interpret=True)

    mesh = Mesh(np.asarray(jax.devices()[:nshards]), ("e",))
    with mesh:
        got = caar_dss_banded_t4(
            scal, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"],
            pt["bstrt"], pt["meta"], s0, sm1, pt["qdp"], pt["pecnd"],
            pt["vn0u"], pt["vn0v"], pt["omg"], plan, rsp, mesh, m,
            eb=eb, nlev=4, interpret=True)

    names = ("assembled", "phi", "vn0u", "vn0v", "omg")
    for name, a, b in zip(names, got, (ref[0],) + tuple(ref[1:])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6, err_msg=name)
