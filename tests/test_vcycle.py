"""Device V-cycle + min_quad_with_fixed_mg on a synthetic subdivision
hierarchy (ground-truth prolongations, independent of SSP decimation)."""

import numpy as np
import scipy.sparse as sp

from surface_multigrid_code_tpu.config import SolveConfig, SmootherType
from surface_multigrid_code_tpu.ops.laplacian import cotmatrix, massmatrix
from surface_multigrid_code_tpu.solver.hierarchy import MGLevel
from surface_multigrid_code_tpu.solver.mqwf_mg import (
    min_quad_with_fixed_mg_precompute,
    min_quad_with_fixed_mg_solve,
)
from surface_multigrid_code_tpu.utils.synthetic import subdivision_hierarchy


def build_mg(n_subdiv=3):
    meshes, Ps = subdivision_hierarchy(n_subdiv)
    mg = [MGLevel(V=meshes[0][0], F=meshes[0][1])]
    for lv in range(1, len(meshes)):
        P = Ps[lv - 1].tocsr()
        mg.append(
            MGLevel(V=meshes[lv][0], F=meshes[lv][1], P_full=P, P=P, PT=P.T.tocsr())
        )
    return mg


def poisson_system(mg):
    V, F = mg[0].V, mg[0].F
    A = (-cotmatrix(V, F) + 1e-2 * massmatrix(V, F, "barycentric")).tocsr()
    rng = np.random.default_rng(0)
    B = massmatrix(V, F, "barycentric") @ rng.normal(size=V.shape[0])
    return A, B


def test_unconstrained_solve_converges():
    mg = build_mg(3)
    A, B = poisson_system(mg)
    data = min_quad_with_fixed_mg_precompute(A, None, mg)
    z, r_his, ok = min_quad_with_fixed_mg_solve(data, B, tolerance=1e-8)
    assert ok, f"residuals: {r_his}"
    assert np.linalg.norm(B - A @ z) < 1e-8
    # multigrid-grade convergence: large per-cycle reduction factor
    rates = [r_his[i + 1] / r_his[i] for i in range(len(r_his) - 1)]
    assert np.median(rates) < 0.2, rates


def test_unconstrained_jacobi_converges():
    mg = build_mg(3)
    A, B = poisson_system(mg)
    cfg = SolveConfig(smoother=SmootherType.JACOBI)
    data = min_quad_with_fixed_mg_precompute(A, None, mg, cfg=cfg)
    z, r_his, ok = min_quad_with_fixed_mg_solve(data, B, tolerance=1e-8)
    assert ok, f"residuals: {r_his}"


def test_constrained_solve_matches_direct():
    mg = build_mg(3)
    V, F = mg[0].V, mg[0].F
    A = (-cotmatrix(V, F)).tocsr()
    n = A.shape[0]
    rng = np.random.default_rng(1)
    known = np.sort(rng.choice(n, size=12, replace=False))
    known_val = rng.normal(size=12)
    B = massmatrix(V, F, "barycentric") @ np.ones(n)
    z, r_his, ok = None, None, None
    data = min_quad_with_fixed_mg_precompute(A, known, mg)
    z, r_his, ok = min_quad_with_fixed_mg_solve(
        data, B, known_val, tolerance=1e-10, max_iter=40
    )
    assert ok, f"residuals: {r_his}"
    np.testing.assert_allclose(z[known], known_val)
    # direct solve oracle
    unknown = np.setdiff1d(np.arange(n), known)
    A_uu = A[unknown][:, unknown]
    A_uk = A[unknown][:, known]
    rhs = B[unknown] - A_uk @ known_val
    z_direct = sp.linalg.spsolve(A_uu.tocsc(), rhs)
    np.testing.assert_allclose(z[unknown], z_direct, atol=1e-6)


def test_multicolumn_rhs():
    mg = build_mg(3)
    A, _ = poisson_system(mg)
    n = A.shape[0]
    rng = np.random.default_rng(2)
    B = rng.normal(size=(n, 3))
    data = min_quad_with_fixed_mg_precompute(A, None, mg)
    Z, r_his, ok = min_quad_with_fixed_mg_solve(data, B, tolerance=1e-8, max_iter=40)
    assert ok
    assert np.linalg.norm(B - A @ Z) < 1e-8


def test_residual_history_semantics():
    """r_his[0] is the initial residual (recorded before any cycle); an
    already-converged initial guess runs zero cycles (reference
    src/min_quad_with_fixed_mg.cpp:330-347)."""
    mg = build_mg(2)
    A, B = poisson_system(mg)
    data = min_quad_with_fixed_mg_precompute(A, None, mg)
    z, r_his, ok = min_quad_with_fixed_mg_solve(data, B, tolerance=1e-8)
    z2, r_his2, ok2 = min_quad_with_fixed_mg_solve(data, B, z0=z, tolerance=1e-6)
    assert ok2 and len(r_his2) == 1
    np.testing.assert_allclose(z2, z)
    np.testing.assert_allclose(
        r_his[0], np.linalg.norm(B), rtol=1e-10
    )  # z0 = 0 -> residual = ||B||
