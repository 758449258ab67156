"""Example 03 — constrained Poisson solve (reference 03_mg_solver/main.cpp).

A = -cotmatrix, B = M @ 1 with B(b) = 0, Dirichlet z(b) = 0 on the boundary
vertices of ogre.obj (reference :44-61); multigrid solve with default
tolerance 1e-3 / 20 V-cycles; prints the residual history.
"""

import numpy as np

from common import out_path
from surface_multigrid_code_tpu import (
    mg_precompute,
    min_quad_with_fixed_mg_precompute,
    min_quad_with_fixed_mg_solve,
)
from surface_multigrid_code_tpu.ops.laplacian import cotmatrix, massmatrix
from surface_multigrid_code_tpu.utils.mesh import boundary_loops, normalize_unit_area
from surface_multigrid_code_tpu.utils.obj_io import read_obj
from surface_multigrid_code_tpu.utils.paths import mesh_path


def main():
    V, F = read_obj(mesh_path("ogre"))
    V = normalize_unit_area(V, F)
    print(f"original mesh: |V| {V.shape[0]}, |F|: {F.shape[0]}")

    mg = mg_precompute(V, F, ratio=0.25, min_coarsest_nv=500, dec_type=1)

    A = (-cotmatrix(V, F)).tocsr()
    # igl::boundary_loop single-loop overload = the longest loop
    b = boundary_loops(F)[0]
    bval = np.zeros(b.shape[0])
    B = np.asarray(massmatrix(V, F, kind="voronoi") @ np.ones(V.shape[0]))
    B[b] = 0.0

    data = min_quad_with_fixed_mg_precompute(A, b, mg)
    z, r_his, converged = min_quad_with_fixed_mg_solve(
        data, B, known_val=bval, z0=np.zeros(V.shape[0])
    )
    print("residual history:", ["%.4e" % r for r in r_his])
    print("converged:", converged)
    np.savez(out_path("ex03_solution.npz"), z=z, r_his=np.asarray(r_his))
    print(f"wrote {out_path('ex03_solution.npz')}")


if __name__ == "__main__":
    main()
