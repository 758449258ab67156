from surface_multigrid_code_tpu.utils.obj_io import read_obj, write_obj
from surface_multigrid_code_tpu.utils.mesh import (
    edges_and_flaps,
    is_edge_manifold,
    normalize_unit_area,
    connect_boundary_to_infinity,
    remove_unreferenced,
)
from surface_multigrid_code_tpu.utils.barycentric import compute_barycentric
from surface_multigrid_code_tpu.utils.profiler import profile_region, profiler_report

__all__ = [
    "read_obj",
    "write_obj",
    "edges_and_flaps",
    "is_edge_manifold",
    "normalize_unit_area",
    "connect_boundary_to_infinity",
    "remove_unreferenced",
    "compute_barycentric",
    "profile_region",
    "profiler_report",
]
