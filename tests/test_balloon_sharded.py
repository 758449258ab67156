"""Sharded balloon Newton solves (parallel/balloon.py) vs single-device."""

import numpy as np

from surface_multigrid_code_tpu.models.balloon import (
    implicit_euler_mg_balloon,
    lumped_mass_matrix,
    vertex_normals,
)
from surface_multigrid_code_tpu.models.shell import ShellEnergy, lame_parameters
from surface_multigrid_code_tpu.ops.laplacian import massmatrix
from surface_multigrid_code_tpu.parallel.balloon import (
    implicit_euler_mg_balloon_sharded,
)
from surface_multigrid_code_tpu.parallel.spmd import make_row_mesh
from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute_block
from surface_multigrid_code_tpu.utils.synthetic import icosphere


def setup():
    V, F = icosphere(2)
    alpha, beta = lame_parameters(6e4, 0.3)
    shell = ShellEnergy(V, F, 0.1, alpha, beta, "neohookean")
    M = 1000.0 * lumped_mass_matrix(V, F)
    mg = mg_precompute_block(V, F, min_coarsest_nv=60, verbose=False)
    N = vertex_normals(V, F)
    Mvd = np.asarray(massmatrix(V, F, kind="voronoi").diagonal())
    fExt = (-(N * Mvd[:, None]) * 1e3).reshape(-1)
    return V, F, shell, M, mg, fExt


def test_sharded_stiff_newton_direction_matches():
    # regression: stiff rest-state Hessians carry exactly-zero stored
    # entries; (a) scipy sparse addition pruned them from the halo pad
    # rows, shifting every A_src id, and (b) value==0 slots were
    # misclassified as structural ELL padding — both silently corrupted
    # the refreshed sharded operator (residuals diverged 5e2 -> 3e22)
    V, F = icosphere(2)
    alpha, beta = lame_parameters(6e6, 0.5 - 1e-3)
    shell = ShellEnergy(V, F, 0.1, alpha, beta, "neohookean")
    M = 1000.0 * lumped_mass_matrix(V, F)
    mg = mg_precompute_block(V, F, min_coarsest_nv=60, verbose=False)
    dt = 1e-3
    N = vertex_normals(V, F)
    Mvd = np.asarray(massmatrix(V, F, kind="voronoi").diagonal())
    fExt = (-(N * Mvd[:, None]) * 1e6).reshape(-1)
    g = -(dt * shell.gradient(V.reshape(-1)) + dt * fExt)

    from surface_multigrid_code_tpu.models.balloon import BalloonNewtonSolver
    from surface_multigrid_code_tpu.parallel.balloon import ShardedBalloonNewton

    single = BalloonNewtonSolver(shell, M, mg)
    vals = single.hessian_values(V.reshape(-1), dt)
    dx1, r1, ok1 = single.solver.solve(vals, g, tolerance=1e-9, max_iter=20)
    ns = ShardedBalloonNewton(shell, M, mg, make_row_mesh(4), dt)
    dx2, r2, ok2 = ns.solve(vals, g, tolerance=1e-9, max_iter=20)
    assert ok1 and ok2, (r1, r2)
    np.testing.assert_allclose(dx2, np.asarray(dx1), atol=1e-10)


def test_sharded_balloon_matches_single_device():
    V, F, shell, M, mg, fExt = setup()
    dt = 1e-3
    qdot0 = np.zeros(3 * V.shape[0])
    # tight mg tolerance -> both paths compute (near-)exact Newton
    # directions, so the trajectories must coincide
    p1, q1, _ = implicit_euler_mg_balloon(
        shell, M, V.copy(), qdot0, fExt, dt, mg, n_newton=3,
        mg_tolerance=1e-8, verbose=False,
    )
    p2, q2, ns = implicit_euler_mg_balloon_sharded(
        shell, M, V.copy(), qdot0, fExt, dt, mg, make_row_mesh(4),
        n_newton=3, mg_tolerance=1e-8, verbose=False,
    )
    scale = max(1.0, np.abs(p1 - V).max())
    assert np.abs(p1 - p2).max() < 1e-6 * scale
    # second step reuses the cached sharded hierarchy
    p2b, q2b, _ = implicit_euler_mg_balloon_sharded(
        shell, M, p2, q2, fExt, dt, mg, make_row_mesh(4),
        n_newton=2, mg_tolerance=1e-8, newton_solver=ns, verbose=False,
    )
    assert np.isfinite(p2b).all()
    assert np.abs(p2b - V).max() > np.abs(p2 - V).max() * 0.5
