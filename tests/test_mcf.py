"""Device-resident MCF stepper: convergence, smoothing behavior, and
agreement with the host-assembled path."""

import numpy as np

import jax.numpy as jnp

from surface_multigrid_code_tpu.models.mcf import MCFStepper
from surface_multigrid_code_tpu.ops.laplacian import cotmatrix, massmatrix
from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute
from surface_multigrid_code_tpu.solver.mqwf_mg import (
    min_quad_with_fixed_mg_precompute,
    min_quad_with_fixed_mg_solve,
)
from surface_multigrid_code_tpu.utils.mesh import normalize_unit_area
from surface_multigrid_code_tpu.utils.synthetic import icosphere


def bumpy_sphere():
    V, F = icosphere(3)
    rng = np.random.default_rng(0)
    V = V * (1.0 + 0.1 * np.sin(5 * V[:, [0]]) * np.cos(5 * V[:, [1]]))
    return normalize_unit_area(V, F), F


def test_mcf_step_smooths_and_converges():
    V, F = bumpy_sphere()
    mg = mg_precompute(V, F, min_coarsest_nv=100, verbose=False)
    stepper = MCFStepper(V, F, mg, dtype=jnp.float64)
    U = V.copy()
    rough0 = None
    for _ in range(3):
        U, r_his, ok = stepper.step(U)
        assert ok, r_his
    # surface got smoother: radial roughness of the bumpy sphere decreased
    # (coordinate Dirichlet energy is exactly 2*area — invariant — so use
    # the radius spread about the centroid instead)
    def roughness(X):
        C = X - X.mean(axis=0)
        r = np.linalg.norm(C, axis=1)
        return r.std() / r.mean()

    assert roughness(U) < 0.7 * roughness(V)
    # area stayed normalized
    from surface_multigrid_code_tpu.utils.mesh import doublearea

    assert abs(doublearea(U, F).sum() / 2.0 - 1.0) < 1e-6


def test_mcf_matches_host_path():
    V, F = bumpy_sphere()
    mg = mg_precompute(V, F, min_coarsest_nv=100, verbose=False)
    stepper = MCFStepper(V, F, mg, dtype=jnp.float64)
    U1, r1, _ = stepper.step(V.copy())

    # host-assembled single step (ex-05 style, same smoother default)
    L = cotmatrix(V, F)
    M = massmatrix(V, F, kind="barycentric")
    LHS = (M - 0.01 * L).tocsr()
    RHS = np.asarray(M @ V)
    data = min_quad_with_fixed_mg_precompute(LHS, None, mg, dtype=jnp.float64)
    U2, r2, _ = min_quad_with_fixed_mg_solve(
        data, RHS, z0=V.copy(), tolerance=5e-7, max_iter=20
    )
    U2 = normalize_unit_area(U2, F)
    np.testing.assert_allclose(r1, r2, rtol=1e-6)
    np.testing.assert_allclose(U1, U2, atol=1e-9)
