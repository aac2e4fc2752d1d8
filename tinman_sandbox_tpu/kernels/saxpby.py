"""saxpby microkernel — the reference's bandwidth probe, Pallas edition.

Parity with /root/reference/saxpby_test/ (x = a*x + b*y over I1*128*256
doubles, 100 iterations): a fused triad that measures achievable HBM
bandwidth. On TPU this is the Pallas hello-world perf probe (SURVEY §7).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["saxpby", "saxpby_bandwidth_gbs"]


def _kernel(scal_ref, x_ref, y_ref, o_ref):
    o_ref[:] = scal_ref[0, 0] * x_ref[:] + scal_ref[0, 1] * y_ref[:]


@partial(jax.jit, static_argnames=("block",))
def saxpby(a, b, x, y, block: int = 128):
    """x' = a*x + b*y elementwise; x, y are [rows, cols] with rows % block == 0.

    In-place on x's buffer (input_output_alias) so traffic is 2 reads +
    1 write, exactly the reference's triad (saxpby_test/cxx/common.cpp:3-16).
    """
    rows, cols = x.shape
    assert rows % block == 0
    scal = jnp.stack([jnp.asarray(a, x.dtype), jnp.asarray(b, x.dtype)]).reshape(1, 2)
    return pl.pallas_call(
        _kernel,
        grid=(rows // block,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block, cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        input_output_aliases={1: 0},
    )(scal, x, y)


def saxpby_bandwidth_gbs(rows=8192, cols=4096, iters=50, dtype=jnp.float32):
    """Measured triad bandwidth in GB/s (3 accesses per element)."""
    import time

    import numpy as np

    x = jnp.asarray(np.random.default_rng(0).normal(size=(rows, cols)), dtype)
    y = jnp.asarray(np.random.default_rng(1).normal(size=(rows, cols)), dtype)
    x = saxpby(1.0, 0.0, x, y)  # warm-up/compile
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = saxpby(3.0, 5.0, x, y)
    jax.block_until_ready(x)
    dt = time.perf_counter() - t0
    nbytes = 3 * rows * cols * jnp.dtype(dtype).itemsize * iters
    return nbytes / dt / 1e9
