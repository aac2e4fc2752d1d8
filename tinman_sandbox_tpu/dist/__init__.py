"""Distribution layer: cubed-sphere mesh, DSS assembly, element sharding."""

from .cubed_sphere import CubedSphere, build_cubed_sphere
from .dss import dss_project, dss_scaled, dss_sum
from .halo import DssPlan, dss_scaled_halo, dss_sum_halo, make_dss_plan
from .halo_ppermute import (
    PpermutePlan,
    dss_scaled_ppermute,
    dss_sum_ppermute,
    make_ppermute_plan,
)
from .overlap import (
    OverlapPlan,
    caar_ppermute_overlap_step,
    make_overlap_plan,
)
from .banded_t4 import caar_dss_banded_t4, dss_banded_t
from .prim_banded import (
    hypervis_banded_t,
    prim_step_banded_t4,
    ssprk3_banded_t4,
    tracer_banded_t,
)
from .sharded_t4 import (
    caar_dss_sharded_t4,
    make_face_mesh,
    shard_packed_t4,
)
from .sharding import make_mesh, replicate, shard_problem
from .step import caar_dss_step, caar_halo_step, caar_ppermute_step
from .structured_dss import (
    StructuredDssPlan,
    dss_structured,
    dss_structured_scaled,
    make_structured_plan,
)

__all__ = [
    "CubedSphere",
    "build_cubed_sphere",
    "dss_sum",
    "dss_scaled",
    "dss_project",
    "make_mesh",
    "shard_problem",
    "caar_dss_step",
    "caar_halo_step",
    "DssPlan",
    "make_dss_plan",
    "dss_sum_halo",
    "dss_scaled_halo",
    "PpermutePlan",
    "make_ppermute_plan",
    "dss_sum_ppermute",
    "dss_scaled_ppermute",
    "caar_ppermute_step",
    "OverlapPlan",
    "make_overlap_plan",
    "caar_ppermute_overlap_step",
    "StructuredDssPlan",
    "make_structured_plan",
    "dss_structured",
    "dss_structured_scaled",
    "replicate",
    "caar_dss_sharded_t4",
    "caar_dss_banded_t4",
    "dss_banded_t",
    "ssprk3_banded_t4",
    "hypervis_banded_t",
    "tracer_banded_t",
    "prim_step_banded_t4",
    "make_face_mesh",
    "shard_packed_t4",
]
