from surface_multigrid_code_tpu.ops.laplacian import (
    cotmatrix,
    cotmatrix_entries,
    massmatrix,
    massmatrix_barycentric,
)
from surface_multigrid_code_tpu.ops.sparse import ELLMatrix, ell_from_csr, ell_spmv

__all__ = [
    "cotmatrix",
    "cotmatrix_entries",
    "massmatrix",
    "massmatrix_barycentric",
    "ELLMatrix",
    "ell_from_csr",
    "ell_spmv",
]
