"""Example 08 — subdivision remeshing (reference 08_subdiv_remesh/main.cpp).

Decimate bunny to 500 faces (midpoint), midpoint-upsample the coarse mesh
2x, express every subdivided vertex as barycentrics on the coarse mesh,
query coarse->fine, and write the semi-regular remeshes output_s{0,1,2}.obj
(the reference commits these as its only golden artifacts).
"""

import numpy as np

from common import out_path, write_obj
from surface_multigrid_code_tpu.query.maps import query_coarse_to_fine
from surface_multigrid_code_tpu.ssp.decimate import SSP_decimate
from surface_multigrid_code_tpu.utils.obj_io import read_obj
from surface_multigrid_code_tpu.utils.paths import mesh_path
from surface_multigrid_code_tpu.utils.upsample import upsample_barycentric


def main(mesh="bunny", tarF=500, num_subdivs=2, dec_type=1, seed=None, tag="ex08"):
    VO, FO = read_obj(mesh_path(mesh) if not mesh.endswith(".obj") else mesh)
    print(f"original mesh: |V| {VO.shape[0]}, |F|: {FO.shape[0]}")
    ok, V, F, IMF, IM, log = SSP_decimate(VO, FO, tarF, dec_type, seed=seed)
    assert ok
    print(f"coarse: |V| {V.shape[0]}, |F| {F.shape[0]}")

    BC, BF, FIdx, faces = upsample_barycentric(V, F, num_subdivs)
    BC, BF, FIdx = query_coarse_to_fine(log, BC, BF, FIdx)
    SV = (BC[:, :, None] * VO[BF]).sum(axis=1)

    # split into per-level meshes: the first nV_k subdivided vertices are
    # exactly level k's vertices (reference main.cpp:156-165)
    nv = V.shape[0]
    for it, Fk in enumerate(faces):
        write_obj(out_path(f"{tag}_output_s{it}.obj"), SV[: Fk.max() + 1], Fk)


if __name__ == "__main__":
    main()
