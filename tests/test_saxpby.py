"""saxpby Pallas microkernel (interpret-compatible on CPU via jit backend)."""
import jax
import jax.numpy as jnp
import numpy as np


def test_saxpby_matches_numpy():
    from jax.experimental import pallas as pl

    from tinman_sandbox_tpu.kernels.saxpby import saxpby

    rng = np.random.default_rng(0)
    x_np = rng.normal(size=(256, 256)).astype(np.float32)
    y_np = rng.normal(size=(256, 256)).astype(np.float32)
    x, y = jnp.asarray(x_np), jnp.asarray(y_np)  # x's buffer is donated below
    # CPU backend: run the kernel interpreted
    with jax.disable_jit():
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            out = saxpby(3.0, 5.0, x, y, block=128)
    np.testing.assert_allclose(
        np.asarray(out), 3.0 * x_np + 5.0 * y_np, rtol=1e-5, atol=1e-5
    )
