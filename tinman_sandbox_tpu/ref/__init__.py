from .caar_ref import caar_ref, gradient_sphere_ref, divergence_sphere_ref, vorticity_ref

__all__ = [
    "caar_ref",
    "gradient_sphere_ref",
    "divergence_sphere_ref",
    "vorticity_ref",
]
