from surface_multigrid_code_tpu.solver.vcycle import (
    DeviceLevel,
    DeviceHierarchy,
    vcycle,
    build_device_hierarchy,
)
from surface_multigrid_code_tpu.solver.hierarchy import (
    MGLevel,
    get_prolong,
    get_prolong_block,
    mg_precompute,
    mg_precompute_block,
)
from surface_multigrid_code_tpu.solver.mqwf_mg import (
    MQWFData,
    min_quad_with_fixed_mg_precompute,
    min_quad_with_fixed_mg_solve,
)

__all__ = [
    "DeviceLevel",
    "DeviceHierarchy",
    "vcycle",
    "build_device_hierarchy",
    "MGLevel",
    "get_prolong",
    "get_prolong_block",
    "mg_precompute",
    "mg_precompute_block",
    "MQWFData",
    "min_quad_with_fixed_mg_precompute",
    "min_quad_with_fixed_mg_solve",
]
