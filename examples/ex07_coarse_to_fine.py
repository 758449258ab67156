"""Example 07 — coarse-to-fine SSP queries (reference 07_coarse_to_fine/main.cpp).

Decimates bunny to 1000 faces with qslim, then maps every coarse vertex
back onto the fine surface through the inverse SSP walk; writes the mapped
point cloud.
"""

import numpy as np

from common import out_path, write_obj
from surface_multigrid_code_tpu.query.maps import query_coarse_to_fine
from surface_multigrid_code_tpu.ssp.decimate import SSP_decimate
from surface_multigrid_code_tpu.utils.obj_io import read_obj
from surface_multigrid_code_tpu.utils.paths import mesh_path


def corner_seeds(Vn, F):
    """Per-vertex (BC one-hot, BF, FIdx) at the first incident face
    (reference main.cpp:43-56)."""
    n = Vn
    BC = np.zeros((n, 3))
    BF = np.zeros((n, 3), dtype=np.int64)
    FIdx = np.zeros(n, dtype=np.int64)
    seen = np.zeros(n, bool)
    for fi, f in enumerate(F):
        for c, v in enumerate(f):
            if not seen[v]:
                seen[v] = True
                BC[v, c] = 1.0
                BF[v] = f
                FIdx[v] = fi
    return BC, BF, FIdx


def main():
    VO, FO = read_obj(mesh_path("bunny"))
    print(f"original mesh: |V| {VO.shape[0]}, |F|: {FO.shape[0]}")
    tarF, dec_type = 1000, 0  # qslim (reference main.cpp:32-33)
    ok, V, F, IMF, IM, log = SSP_decimate(VO, FO, tarF, dec_type)
    assert ok
    print(f"coarse: |V| {V.shape[0]}, |F| {F.shape[0]}")

    BC, BF, FIdx = corner_seeds(V.shape[0], F)
    BC, BF, FIdx = query_coarse_to_fine(log, BC, BF, FIdx)
    pt = (BC[:, :, None] * VO[BF]).sum(axis=1)
    print(f"mapped {pt.shape[0]} coarse vertices onto the fine surface")
    write_obj(out_path("ex07_points.obj"), pt)
    write_obj(out_path("ex07_coarse.obj"), V, F)


if __name__ == "__main__":
    main()
