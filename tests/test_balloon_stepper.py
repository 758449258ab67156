"""DeviceBalloonStepper (fully jitted Newton loop) vs the host-orchestrated
implicit_euler_mg_balloon."""

import numpy as np

from surface_multigrid_code_tpu.models.balloon import (
    DeviceBalloonStepper,
    implicit_euler_mg_balloon,
    lumped_mass_matrix,
    vertex_normals,
)
from surface_multigrid_code_tpu.models.shell import ShellEnergy, lame_parameters
from surface_multigrid_code_tpu.ops.laplacian import massmatrix
from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute_block
from surface_multigrid_code_tpu.utils.synthetic import icosphere


def setup(bending=False):
    V, F = icosphere(2)
    alpha, beta = lame_parameters(6e4, 0.3)
    shell = ShellEnergy(V, F, 0.1, alpha, beta, "neohookean", bending=bending)
    M = 1000.0 * lumped_mass_matrix(V, F)
    mg = mg_precompute_block(V, F, min_coarsest_nv=60, verbose=False)
    N = vertex_normals(V, F)
    Mvd = np.asarray(massmatrix(V, F, kind="voronoi").diagonal())
    fExt = (-(N * Mvd[:, None]) * 1e3).reshape(-1)
    return V, F, shell, M, mg, fExt


def test_device_stepper_matches_host():
    V, F, shell, M, mg, fExt = setup()
    dt = 1e-3
    stepper = DeviceBalloonStepper(
        shell, M, mg, dt, mg_tolerance=1e-8, n_newton=3
    )
    qdot0 = np.zeros(3 * V.shape[0])
    p1, q1 = stepper.step(V.copy(), qdot0, fExt)
    p2, q2, _ = implicit_euler_mg_balloon(
        shell, M, V.copy(), qdot0, fExt, dt, mg, n_newton=3,
        mg_tolerance=1e-8, newton_solver=stepper.newton_solver, verbose=False,
    )
    scale = max(1.0, np.abs(p2 - V).max())
    assert np.abs(p1 - p2).max() < 1e-6 * scale
    # second step continues from the first
    p1b, q1b = stepper.step(p1, q1, fExt)
    assert np.isfinite(p1b).all()
    assert np.abs(p1b - V).max() > np.abs(p1 - V).max() * 0.5


def test_device_stepper_bending_runs():
    V, F, shell, M, mg, fExt = setup(bending=True)
    stepper = DeviceBalloonStepper(shell, M, mg, 1e-3, n_newton=2)
    p, q = stepper.step(V.copy(), np.zeros(3 * V.shape[0]), fExt)
    assert np.isfinite(p).all() and np.isfinite(q).all()
