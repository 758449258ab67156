"""Example 01 — single SSP prolongation (reference 01_single_SSP/main.cpp).

Builds one coarsening level's prolongation P on bunny.obj and evaluates
pt = P @ V_coarse: every fine vertex expressed as a barycentric combination
of coarse vertices lies on the coarse surface.  Outputs the point cloud.
"""

import numpy as np

from common import out_path, write_obj
from surface_multigrid_code_tpu.solver.hierarchy import get_prolong
from surface_multigrid_code_tpu.utils.obj_io import read_obj
from surface_multigrid_code_tpu.utils.paths import mesh_path


def main():
    VO, FO = read_obj(mesh_path("bunny"))
    print(f"original mesh: |V| {VO.shape[0]}, |F|: {FO.shape[0]}")
    tarF = 2000
    V, F, P, J, IM, log = get_prolong(VO, FO, tarF, dec_type=1)
    pt = P @ V  # fine points on the coarse surface (reference main.cpp:35)
    print(f"coarse: |V| {V.shape[0]}, |F| {F.shape[0]}; P {P.shape}, nnz {P.nnz}")
    print(f"max displacement |P Vc - Vf|: {np.abs(pt - VO).max():.5f}")
    write_obj(out_path("ex01_points.obj"), pt)
    write_obj(out_path("ex01_coarse.obj"), V, F)


if __name__ == "__main__":
    main()
