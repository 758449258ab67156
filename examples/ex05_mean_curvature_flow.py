"""Example 05 — mean-curvature flow [Kazhdan et al. 2012]
(reference 05_example_mean_curvature_flow/main.cpp).

Per step: (M - delta*L) U = M @ U_pre with delta = 0.01, where L is the
cotan Laplacian of the ORIGINAL mesh (fixed across steps, reference :42)
and M is the barycentric mass matrix of the CURRENT mesh; unconstrained
multigrid precompute every step with the hierarchy reused, mg tol 5e-7;
re-normalize surface area after each step (reference :53-80).

The reference mesh beard_man.obj is not shipped; we run on bunny.obj.
"""

import numpy as np

from common import out_path, write_obj
from surface_multigrid_code_tpu import (
    mg_precompute,
    min_quad_with_fixed_mg_precompute,
    min_quad_with_fixed_mg_solve,
)
from surface_multigrid_code_tpu.ops.laplacian import cotmatrix, massmatrix
from surface_multigrid_code_tpu.utils.mesh import normalize_unit_area
from surface_multigrid_code_tpu.utils.obj_io import read_obj
from surface_multigrid_code_tpu.utils.paths import mesh_path


def main(n_steps: int = 5):
    V, F = read_obj(mesh_path("bunny"))
    V = normalize_unit_area(V, F)
    print(f"original mesh: |V| {V.shape[0]}, |F|: {F.shape[0]}")

    mg = mg_precompute(V, F, ratio=0.25, min_coarsest_nv=500, dec_type=1)
    L = cotmatrix(V, F).tocsr()
    L.sum_duplicates()

    delta = 0.01
    mg_tol = 5e-7

    # Per-step system (M - delta L) shares L's sparsity (M is diagonal), so
    # the whole per-step precompute collapses to a device value refresh
    # (solver/refresh.py) instead of the reference's per-step SpGEMM+LDLT.
    import jax.numpy as jnp

    from surface_multigrid_code_tpu.solver.refresh import (
        RefreshableMGSolver,
        csr_slot_map,
    )

    pattern = L
    solver = RefreshableMGSolver(mg, pattern, dtype=jnp.float64)
    n = V.shape[0]
    diag_slots = csr_slot_map(pattern, np.arange(n), np.arange(n))

    U = V.copy()
    for step in range(n_steps):
        U_pre = U.copy()
        M = massmatrix(U, F, kind="barycentric")
        vals = -delta * L.data
        vals = vals.copy()
        vals[diag_slots] += np.asarray(M.diagonal())
        RHS = np.asarray(M @ U_pre)
        U, r_his, ok = solver.solve(
            vals, RHS, z0=U_pre, tolerance=mg_tol, max_iter=20
        )
        U = normalize_unit_area(U, F)
        print(
            f"step {step}: {len(r_his)} cycles, final residual {r_his[-1]:.3e}, "
            f"converged={ok}"
        )
        write_obj(out_path(f"ex05_step{step + 1}.obj"), U, F)


if __name__ == "__main__":
    main()
