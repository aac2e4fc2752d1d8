"""Element sharding over a TPU device mesh.

The dycore's parallel axis is the element list (cubed-sphere domain
decomposition, SURVEY §2.9). State/Derived/Geometry pytrees are sharded on
their element axis with NamedSharding; everything else (hvcoord, Dvv, scan
operators) is replicated. Compute stays ordinary jit — XLA SPMD inserts the
collectives (only DSS communicates).
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_problem", "replicate"]

# element-axis position per field name (time-leveled state fields lead with
# the time-level axis)
_ELEM_AXIS = {
    "u": 1, "v": 1, "t": 1, "dp3d": 1, "ps_v": 1, "qdp": 1,
    "phis": 0,
    "vn0_u": 0, "vn0_v": 0, "phi": 0, "omega_p": 0,
    "eta_dot_dpdn": 0, "pecnd": 0,
    "fcor": 0, "metdet": 0, "rmetdet": 0, "spheremp": 0, "rspheremp": 0,
    "d": 0, "dinv": 0, "mp": 0, "metinv": 0, "vec_sph2cart": 0,
    "dvv": None,
}


def make_mesh(n_devices: int | None = None, axis: str = "e") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), axis_names=(axis,))


def _put(mesh, x, elem_axis, axis_name="e"):
    spec = [None] * np.ndim(x)
    if elem_axis is not None and np.ndim(x) > 0:
        spec[elem_axis] = axis_name
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def shard_problem(mesh: Mesh, *trees, axis_name: str = "e"):
    """Shard dataclass pytrees (State/Derived/Geometry) on the element axis.

    Returns the same number of trees, device_put with NamedShardings.
    """
    out = []
    for tree in trees:
        def put(path, x):
            name = path[-1].name if hasattr(path[-1], "name") else str(path[-1])
            return _put(mesh, x, _ELEM_AXIS.get(name, 0), axis_name)

        out.append(jax.tree_util.tree_map_with_path(put, tree))
    return out[0] if len(out) == 1 else tuple(out)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (hvcoord, scan operators, gdof tables) on
    every device of the mesh; scalars (0-dim leaves) are placed too."""
    return jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(*([None] * np.ndim(x))))
        ),
        tree,
    )
