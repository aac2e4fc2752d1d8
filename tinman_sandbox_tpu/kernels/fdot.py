"""f32-accurate MXU dots for the Mosaic (Pallas TPU) kernels.

The TPU MXU multiplies bf16 operands natively; an f32 matmul is emulated
with 1 (``Precision.DEFAULT``), 3, or 6 (``Precision.HIGHEST``) bf16
passes. Mosaic lowers only DEFAULT and HIGHEST:

* DEFAULT truncates f32 operands to bf16 — measured 4e-3 relative error
  on the spectral-derivative terms (u/v/omega_p) of the CAAR step on a
  v5e, far outside the 5e-5 equivalence gate (``tools/tpu_equiv_check``);
* HIGHEST is accurate (1.2e-7) but costs 6 MXU passes — measured +46%
  on the whole transposed CAAR step (274 vs 188 us/step at 1024x72).

``jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X3`` (the 3-pass scheme) is
exactly right but is not lowerable by Mosaic (jax 0.9.0), so these
helpers implement it manually: split each operand into a bf16 hi + lo
pair and keep the three leading cross products,

    a @ b ~= a_hi @ b_hi + a_lo @ b_hi + a_hi @ b_lo

(the dropped a_lo @ b_lo term is ~2^-16 relative). Measured error
4.2e-6 relative on random-normal 128x128 operands — well inside the
gate at half HIGHEST's MXU cost. The HOMME scan operators (0/1
triangular matrices, ``layout.scan_matrices``) are exactly
representable in bf16, so their side needs no split: ``dot_lx`` /
``dot_rx`` use 2 passes.

``make_dots(split=False)`` returns plain f32 ``lax.dot`` for interpret
mode (CPU tests check the math; the committed ``TPU_EQUIV.json``
artifact checks on-chip precision of the split path).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _split(x):
    hi = x.astype(jnp.bfloat16)
    return hi, (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)


def _d(a, b):
    return jax.lax.dot(a, b, preferred_element_type=jnp.float32)


def _split3(v):
    """Exact 3-limb bf16 decomposition of an f32 array: each limb captures
    8 mantissa bits (bf16 shares f32's exponent range), each residual
    subtraction is exact, so h1 + h2 + h3 reconstructs v BITWISE (24 = 3x8
    mantissa bits; the non-overlapping limb sums are exact in f32)."""
    h1 = v.astype(jnp.bfloat16)
    r1 = v - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    h3 = (r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16)
    return h1, h2, h3


def make_sel(split: bool):
    """Exact one-hot selection contractions for the compact DSS fix-lane
    slab (kernels/dss_pallas.py): ``sel_l(q, v) = q @ v`` and
    ``sel_r(v, p) = v @ p`` where q/p are 0/1 matrices with AT MOST ONE
    nonzero per output element's reduction — i.e. pure row selection /
    lane placement. q/p are bf16-exact; v is split into three exact bf16
    limbs (`_split3`), each MXU pass selects one limb exactly
    (bf16 x bf16 products accumulate in f32), and the limb sums
    reconstruct v bitwise — unlike `make_dots`'s 3-pass approximation,
    this is EXACT, which keeps the producer-fused slab bitwise equal to
    the `extract_tiles_t` reference (gated in tests + tpu_equiv_check)."""
    if not split:
        def sel_l(q, v):
            return _d(q.astype(v.dtype), v)

        def sel_r(v, p):
            return _d(v, p.astype(v.dtype))

        return sel_l, sel_r

    def sel_l(q, v):
        h1, h2, h3 = _split3(v)
        return (_d(q, h1) + _d(q, h2)) + _d(q, h3)

    def sel_r(v, p):
        h1, h2, h3 = _split3(v)
        return (_d(h1, p) + _d(h2, p)) + _d(h3, p)

    return sel_l, sel_r


def make_dots(split: bool):
    """Return ``(dot, dot_lx, dot_rx)`` contraction helpers.

    dot(a, b)    — both operands general f32 (3 MXU passes when split);
    dot_lx(a, b) — lhs exactly representable in bf16 (2 passes);
    dot_rx(a, b) — rhs exactly representable in bf16 (2 passes).
    """
    if not split:
        return _d, _d, _d

    def dot(a, b):
        a_hi, a_lo = _split(a)
        b_hi, b_lo = _split(b)
        return _d(a_hi, b_hi) + _d(a_lo, b_hi) + _d(a_hi, b_lo)

    def dot_lx(a, b):
        a_bf = a.astype(jnp.bfloat16)
        b_hi, b_lo = _split(b)
        return _d(a_bf, b_hi) + _d(a_bf, b_lo)

    def dot_rx(a, b):
        a_hi, a_lo = _split(a)
        b_bf = b.astype(jnp.bfloat16)
        return _d(a_hi, b_bf) + _d(a_lo, b_bf)

    return dot, dot_lx, dot_rx
