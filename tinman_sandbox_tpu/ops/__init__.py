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
    laplace_tensor_replace,
    vlaplace_sphere_wk_cartesian,
    vlaplace_sphere_wk_cartesian_reduced,
    vlaplace_sphere_wk_contra,
    vorticity_sphere,
    vorticity_sphere_vector,
)
from .diagnostics import energy_diagnostics, global_integral
from .limiter import element_bounds, limit_tracer
from .norms import dump_results, kahan_norm, print_results_2norm, state_norms
from .remap import reference_dp, remap_column, vertical_remap
from .scans import (
    eta_dot_dpdn_rsplit0,
    midpoint_pressure,
    preq_hydrostatic,
    preq_omega_ps,
    preq_vertadv,
)
from .thermo import virtual_temperature

__all__ = [
    "gradient_sphere",
    "gradient_sphere_update",
    "divergence_sphere",
    "divergence_sphere_update",
    "divergence_sphere_wk",
    "vorticity_sphere",
    "vorticity_sphere_vector",
    "laplace_simple",
    "laplace_tensor",
    "laplace_tensor_replace",
    "curl_sphere_wk_testcov",
    "grad_sphere_wk_testcov",
    "vlaplace_sphere_wk_cartesian",
    "vlaplace_sphere_wk_cartesian_reduced",
    "vlaplace_sphere_wk_contra",
    "midpoint_pressure",
    "preq_hydrostatic",
    "preq_omega_ps",
    "virtual_temperature",
    "eta_dot_dpdn_rsplit0",
    "preq_vertadv",
    "kahan_norm",
    "state_norms",
    "print_results_2norm",
    "dump_results",
    "energy_diagnostics",
    "global_integral",
    "remap_column",
    "reference_dp",
    "vertical_remap",
    "limit_tracer",
    "element_bounds",
]
