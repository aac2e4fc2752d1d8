"""Checkpoint / restore of the prognostic state.

The reference has no checkpointing (SURVEY §5); its closest artifacts are the
result text dumps (cxx/basic/compute_and_apply_rhs.cpp:395-481) and the
F90<->C++ state pull/push machinery (Elements.hpp:92-117). Here the state is a
pytree, so checkpointing is a flat .npz of leaves + the time-level indices.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Tuple

import jax
import numpy as np

from ..config import Config
from ..state import Derived, State

__all__ = ["save_checkpoint", "load_checkpoint"]

_STATE_FIELDS = [f.name for f in dataclasses.fields(State)]
_DERIVED_FIELDS = [f.name for f in dataclasses.fields(Derived)]


def save_checkpoint(path: str, state: State, derived: Derived, cfg: Config,
                    step: int) -> None:
    """Write state + derived + run metadata to ``path`` (.npz)."""
    arrays = {f"state.{n}": np.asarray(getattr(state, n)) for n in _STATE_FIELDS}
    arrays |= {f"derived.{n}": np.asarray(getattr(derived, n)) for n in _DERIVED_FIELDS}
    meta = {
        "step": step,
        "n0": cfg.n0, "np1": cfg.np1, "nm1": cfg.nm1, "qn0": cfg.qn0,
        "nlev": cfg.nlev, "qsize": cfg.qsize, "nelem": cfg.nelem,
    }
    arrays["meta"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    ).copy()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)  # atomic publish: never a half-written checkpoint


def load_checkpoint(path: str, cfg: Config) -> Tuple[State, Derived, Config, int]:
    """Read a checkpoint; returns (state, derived, cfg-with-time-levels, step)."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"]).decode())
        for dim in ("nlev", "qsize", "nelem"):
            if meta[dim] != getattr(cfg, dim):
                raise ValueError(
                    f"checkpoint {dim}={meta[dim]} != config {dim}={getattr(cfg, dim)}"
                )
        state = State(**{n: jax.numpy.asarray(z[f"state.{n}"]) for n in _STATE_FIELDS})
        derived = Derived(
            **{n: jax.numpy.asarray(z[f"derived.{n}"]) for n in _DERIVED_FIELDS}
        )
    cfg = dataclasses.replace(
        cfg, n0=meta["n0"], np1=meta["np1"], nm1=meta["nm1"], qn0=meta["qn0"]
    )
    return state, derived, cfg, meta["step"]
