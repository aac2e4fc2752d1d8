from .caar_xla import caar_xla

__all__ = ["caar_xla"]
