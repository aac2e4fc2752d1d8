"""Compute kernels: the jitted XLA CAAR and the fused Pallas fast path."""

from .caar_xla import caar_xla


def caar_pallas_available() -> bool:
    """True when the fused Pallas CAAR kernel can run on this backend."""
    try:
        from .caar_pallas import caar_pallas  # noqa: F401
    except ImportError:
        return False
    import jax

    return jax.default_backend() == "tpu"


def __getattr__(name):
    if name in ("caar_pallas", "benchmark_loop_pallas"):
        from . import caar_pallas as _m

        return getattr(_m, name)
    if name == "caar_pallas_t":
        from .caar_pallas_t import caar_pallas_t

        return caar_pallas_t
    raise AttributeError(name)


__all__ = ["caar_xla", "caar_pallas_available"]
