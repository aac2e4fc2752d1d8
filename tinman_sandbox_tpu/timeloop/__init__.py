"""Time integration: benchmark/leapfrog drivers, tracer Euler step, checkpointing."""

from .checkpoint import (
    finish_async_checkpoints,
    load_checkpoint,
    load_checkpoint_orbax,
    load_packed_checkpoint,
    save_checkpoint,
    save_checkpoint_orbax,
    save_packed_checkpoint,
)
from .driver import benchmark_loop, check_dp3d, leapfrog_step, rotated, run_leapfrog
from .hyperviscosity import apply_hyperviscosity, biharmonic_wk
from .prim import prim_run_step
from .rk import ssprk3_step
from .tracer import advance_qdp, euler_step, ssprk3_tracer_step

__all__ = [
    "benchmark_loop",
    "check_dp3d",
    "leapfrog_step",
    "rotated",
    "run_leapfrog",
    "advance_qdp",
    "euler_step",
    "ssprk3_step",
    "prim_run_step",
    "ssprk3_tracer_step",
    "save_checkpoint",
    "load_checkpoint",
    "save_packed_checkpoint",
    "load_packed_checkpoint",
    "save_checkpoint_orbax",
    "load_checkpoint_orbax",
    "finish_async_checkpoints",
    "apply_hyperviscosity",
    "biharmonic_wk",
]
