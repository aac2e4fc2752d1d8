from .sphere import (
    curl_sphere_wk_testcov,
    divergence_sphere,
    divergence_sphere_update,
    divergence_sphere_wk,
    grad_sphere_wk_testcov,
    gradient_sphere,
    gradient_sphere_update,
    laplace_simple,
    laplace_tensor,
    vlaplace_sphere_wk_cartesian,
    vlaplace_sphere_wk_contra,
    vorticity_sphere,
)
from .scans import midpoint_pressure, preq_hydrostatic, preq_omega_ps
from .thermo import virtual_temperature

__all__ = [
    "gradient_sphere",
    "gradient_sphere_update",
    "divergence_sphere",
    "divergence_sphere_update",
    "divergence_sphere_wk",
    "vorticity_sphere",
    "laplace_simple",
    "laplace_tensor",
    "curl_sphere_wk_testcov",
    "grad_sphere_wk_testcov",
    "vlaplace_sphere_wk_cartesian",
    "vlaplace_sphere_wk_contra",
    "midpoint_pressure",
    "preq_hydrostatic",
    "preq_omega_ps",
    "virtual_temperature",
]
