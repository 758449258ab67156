"""Cached-symbolic Galerkin refresh vs scipy triple products."""

import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

from surface_multigrid_code_tpu.ops.laplacian import cotmatrix, massmatrix
from surface_multigrid_code_tpu.solver.galerkin import (
    build_galerkin_plan,
    refresh_values,
)
from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute
from surface_multigrid_code_tpu.utils.synthetic import icosphere


def test_refresh_matches_scipy():
    V, F = icosphere(3)
    mg = mg_precompute(V, F, min_coarsest_nv=60, verbose=False)
    Ps = [mg[lv].P_full.tocsr() for lv in range(1, len(mg))]
    L = cotmatrix(V, F)
    M = massmatrix(V, F)

    A = (M - 0.01 * L).tocsr()
    A.sum_duplicates()
    plan = build_galerkin_plan(A, Ps)

    for delta in (0.01, 0.3):  # two value refreshes, same pattern
        Anew = (M - delta * L).tocsr()
        Anew.sum_duplicates()
        levels = refresh_values(plan, jnp.asarray(Anew.data))
        # scipy reference chain
        ref = Anew
        for lv, (ell_data, diag) in enumerate(levels):
            np.testing.assert_allclose(
                np.asarray(diag), ref.diagonal(), rtol=1e-12, atol=1e-14
            )
            # reconstruct from ELL and compare
            pl_ = plan.lvl0 if lv == 0 else plan.levels[lv - 1]
            n, w = pl_.ell_shape
            rows = np.repeat(np.arange(n), w)
            rec = sp.coo_matrix(
                (
                    np.asarray(ell_data).ravel(),
                    (rows, np.asarray(pl_.ell_indices).ravel()),
                ),
                shape=(n, n),
            ).tocsr()
            diff = abs(rec - ref)
            assert diff.max() < 1e-10 * max(1.0, abs(ref).max())
            if lv < len(levels) - 1:
                ref = (Ps[lv].T @ ref @ Ps[lv]).tocsr()
