"""Example 06 — balloon inflation simulation
(reference 06_example_balloon_sim/main.cpp).

Block (3-DOF) hierarchy on bunny_15K_init.obj + nonlinear implicit Euler
with inflation pressure -N_v * M_v * 1e6, NeoHookean stretching material
(thickness 0.1, poisson 0.5, Young 6e6), dt 1e-3, Newton x10 with
multigrid solves at tol 2e-1.  Writes the inflated mesh per step.
"""

import sys

import numpy as np

from common import out_path, write_obj
from surface_multigrid_code_tpu.models.balloon import (
    implicit_euler_balloon_direct,
    lumped_mass_matrix,
    run_balloon,
    vertex_normals,
)
from surface_multigrid_code_tpu.models.shell import ShellEnergy, lame_parameters
from surface_multigrid_code_tpu.ops.laplacian import massmatrix
from surface_multigrid_code_tpu.utils.obj_io import read_obj
from surface_multigrid_code_tpu.utils.paths import mesh_path


def main(n_steps=1, mesh="bunny_15K_init", use_mg=True):
    V, F = read_obj(mesh_path(mesh))
    print(f"original mesh: |V| {V.shape[0]}, |F|: {F.shape[0]}")
    if use_mg:
        for step, pos in enumerate(
            run_balloon(V, F, n_steps=n_steps, material="neohookean")
        ):
            write_obj(out_path(f"ex06_step{step + 1}.obj"), pos, F)
        return
    # reference useMG=false toggle: direct sparse-LU Newton solves
    alpha, beta = lame_parameters(6e6, 0.5)
    shell = ShellEnergy(V, F, 1e-1, alpha, beta, "neohookean")
    M = 1000.0 * lumped_mass_matrix(V, F)
    pos = V.copy()
    qdot = np.zeros(3 * V.shape[0])
    for step in range(n_steps):
        N = vertex_normals(pos, F)
        Mvd = np.asarray(massmatrix(pos, F, kind="voronoi").diagonal())
        fExt = (-(N * Mvd[:, None]) * 1e6).reshape(-1)
        pos, qdot = implicit_euler_balloon_direct(
            shell, M, pos, qdot, fExt, 1e-3
        )
        print(f"step {step}: max |disp| = {np.abs(pos - V).max():.4f}")
        write_obj(out_path(f"ex06_direct_step{step + 1}.obj"), pos, F)


if __name__ == "__main__":
    main(
        n_steps=int(sys.argv[1]) if len(sys.argv) > 1 else 1,
        use_mg="--direct" not in sys.argv,
    )
