"""Constrained RefreshableMGSolver vs the full constrained precompute."""

import numpy as np

import jax.numpy as jnp

from surface_multigrid_code_tpu.config import SolveConfig, SmootherType
from surface_multigrid_code_tpu.ops.laplacian import cotmatrix, massmatrix
from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute
from surface_multigrid_code_tpu.solver.mqwf_mg import (
    min_quad_with_fixed_mg_precompute,
    min_quad_with_fixed_mg_solve,
)
from surface_multigrid_code_tpu.solver.refresh import RefreshableMGSolver
from surface_multigrid_code_tpu.utils.synthetic import icosphere


def test_constrained_refresh_matches_full():
    V, F = icosphere(3)
    mg = mg_precompute(V, F, min_coarsest_nv=60, verbose=False)
    L = cotmatrix(V, F)
    M = massmatrix(V, F)
    pattern = (-L).tocsr()
    pattern.sum_duplicates()
    rng = np.random.default_rng(5)
    known = np.sort(rng.choice(V.shape[0], 10, replace=False))
    kv = rng.normal(size=10)
    rhs = np.asarray(M @ np.ones(V.shape[0]))

    cfg = SolveConfig(smoother=SmootherType.JACOBI)
    solver = RefreshableMGSolver(
        mg, pattern, known=known, cfg=cfg, dtype=jnp.float64
    )
    for scale in (1.0, 2.5):  # same pattern, different values
        A = (scale * -L).tocsr()
        A.sum_duplicates()
        z1, r1, ok1 = solver.solve(
            A.data, rhs, known_val=kv, tolerance=1e-10, max_iter=40
        )
        # reference path: fresh constrained precompute on a new hierarchy
        # (precompute mutates mg, so rebuild to keep inputs clean)
        mg2 = mg_precompute(V, F, min_coarsest_nv=60, verbose=False)
        data = min_quad_with_fixed_mg_precompute(
            A, known, mg2, cfg=cfg, dtype=jnp.float64
        )
        z2, r2, ok2 = min_quad_with_fixed_mg_solve(
            data, rhs, known_val=kv, tolerance=1e-10, max_iter=40
        )
        assert ok1 and ok2
        np.testing.assert_allclose(z1[known], kv)
        # both converged to the same constrained solution
        np.testing.assert_allclose(z1, z2, atol=1e-8)


def test_constrained_refresh_multicolumn():
    V, F = icosphere(3)
    mg = mg_precompute(V, F, min_coarsest_nv=60, verbose=False)
    L = cotmatrix(V, F)
    M = massmatrix(V, F)
    pattern = (-L).tocsr()
    pattern.sum_duplicates()
    known = np.arange(8)
    kv = np.random.default_rng(0).normal(size=(8, 3))
    rhs = np.asarray(M @ V)
    solver = RefreshableMGSolver(
        mg, pattern, known=known, dtype=jnp.float64
    )
    z, r, ok = solver.solve(
        pattern.data, rhs, known_val=kv, tolerance=1e-10, max_iter=40
    )
    assert ok
    np.testing.assert_allclose(z[known], kv)
    import scipy.sparse as sp

    unknown = np.setdiff1d(np.arange(V.shape[0]), known)
    A = pattern
    z_ref = sp.linalg.spsolve(
        A[unknown][:, unknown].tocsc(),
        rhs[unknown] - A[unknown][:, known] @ kv,
    )
    np.testing.assert_allclose(z[unknown], z_ref, atol=1e-7)
