from surface_multigrid_code_tpu.query.maps import (
    query_fine_to_coarse,
    query_coarse_to_fine,
)

__all__ = ["query_fine_to_coarse", "query_coarse_to_fine"]
