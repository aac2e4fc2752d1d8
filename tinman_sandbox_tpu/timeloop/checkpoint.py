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

__all__ = ["save_checkpoint", "load_checkpoint", "save_checkpoint_orbax",
           "save_packed_checkpoint", "load_packed_checkpoint",
           "load_checkpoint_orbax", "finish_async_checkpoints"]

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


# -- orbax-backed async option ------------------------------------------------

_ASYNC_CKPTR = None


def _orbax_checkpointer():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        import orbax.checkpoint as ocp

        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def save_checkpoint_orbax(path: str, state: State, derived: Derived,
                          cfg: Config, step: int, wait: bool = False):
    """Async (non-blocking) checkpoint via orbax: device arrays are
    snapshotted and written by a background thread while the timeloop keeps
    running. ``path`` is a directory. Pass ``wait=True`` (or call
    ``finish_async_checkpoints``) to block until durable."""
    ckptr = _orbax_checkpointer()
    payload = {
        "state": {n: getattr(state, n) for n in _STATE_FIELDS},
        "derived": {n: getattr(derived, n) for n in _DERIVED_FIELDS},
        "meta": {
            "step": step,
            "n0": cfg.n0, "np1": cfg.np1, "nm1": cfg.nm1, "qn0": cfg.qn0,
            "nlev": cfg.nlev, "qsize": cfg.qsize, "nelem": cfg.nelem,
        },
    }
    import orbax.checkpoint as ocp

    ckptr.save(os.path.abspath(path), args=ocp.args.StandardSave(payload),
               force=True)
    if wait:
        ckptr.wait_until_finished()


def finish_async_checkpoints() -> None:
    """Block until all in-flight orbax saves are durable."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def load_checkpoint_orbax(path: str, cfg: Config):
    """Restore an orbax checkpoint; same contract as load_checkpoint."""
    import orbax.checkpoint as ocp

    with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ckptr:
        z = ckptr.restore(os.path.abspath(path))
    meta = z["meta"]
    for dim in ("nlev", "qsize", "nelem"):
        if int(meta[dim]) != getattr(cfg, dim):
            raise ValueError(
                f"checkpoint {dim}={meta[dim]} != config {dim}={getattr(cfg, dim)}"
            )
    state = State(**{n: jax.numpy.asarray(z["state"][n]) for n in _STATE_FIELDS})
    derived = Derived(
        **{n: jax.numpy.asarray(z["derived"][n]) for n in _DERIVED_FIELDS}
    )
    cfg = dataclasses.replace(
        cfg, n0=int(meta["n0"]), np1=int(meta["np1"]), nm1=int(meta["nm1"]),
        qn0=int(meta["qn0"]),
    )
    return state, derived, cfg, int(meta["step"])


def save_packed_checkpoint(path: str, s, qdp, acc, step: int) -> None:
    """Checkpoint the PACKED cadence chain (prim_step_packed_t4 operands:
    stacked prognostics s [4*nlev, E16], tracer block qdp [qsize*nlev,
    E16], accumulator triple) without unpacking — restart the production
    loop exactly where it stopped. Atomic like save_checkpoint."""
    import json as _json

    arrays = {
        "packed.s": np.asarray(s),
        "packed.qdp": np.asarray(qdp),
        "packed.vn0u": np.asarray(acc[0]),
        "packed.vn0v": np.asarray(acc[1]),
        "packed.omg": np.asarray(acc[2]),
        "meta": np.frombuffer(
            _json.dumps({"step": step, "packed": True}).encode(),
            dtype=np.uint8).copy(),
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_packed_checkpoint(path: str):
    """Read a packed checkpoint; returns (s, qdp, (vn0u, vn0v, omg), step)."""
    import json as _json

    with np.load(path) as z:
        meta = _json.loads(bytes(z["meta"]).decode())
        if not meta.get("packed"):
            raise ValueError(f"{path} is not a packed checkpoint")
        return (z["packed.s"], z["packed.qdp"],
                (z["packed.vn0u"], z["packed.vn0v"], z["packed.omg"]),
                int(meta["step"]))
