"""Chebyshev smoother convergence, hierarchy serialization roundtrip, and
profiler report shape."""

import numpy as np

import jax.numpy as jnp

from surface_multigrid_code_tpu.config import SolveConfig, SmootherType
from surface_multigrid_code_tpu.ops.laplacian import cotmatrix, massmatrix
from surface_multigrid_code_tpu.solver.hierarchy import (
    load_hierarchy,
    mg_precompute,
    save_hierarchy,
)
from surface_multigrid_code_tpu.solver.mqwf_mg import (
    min_quad_with_fixed_mg_precompute,
    min_quad_with_fixed_mg_solve,
)
from surface_multigrid_code_tpu.utils.profiler import (
    profiler_report,
    profiler_reset,
)
from surface_multigrid_code_tpu.utils.synthetic import icosphere


def _system():
    V, F = icosphere(4)
    L = cotmatrix(V, F)
    M = massmatrix(V, F)
    A = (M - 0.01 * L).tocsr()
    rhs = np.asarray(M @ V[:, 0])
    return V, F, A, rhs


def test_chebyshev_smoother_converges():
    V, F, A, rhs = _system()
    mg = mg_precompute(V, F, min_coarsest_nv=100, verbose=False)
    cfg = SolveConfig(smoother=SmootherType.CHEBYSHEV)
    data = min_quad_with_fixed_mg_precompute(A, None, mg, cfg=cfg)
    z, r_his, ok = min_quad_with_fixed_mg_solve(
        data, rhs, tolerance=1e-10, max_iter=30
    )
    assert ok
    err = np.linalg.norm(A @ z - rhs)
    assert err < 1e-9
    # multigrid-grade: at least ~5x reduction per cycle on average
    rate = (r_his[-1] / r_his[0]) ** (1 / (len(r_his) - 1))
    assert rate < 0.2, r_his


def test_hierarchy_roundtrip(tmp_path):
    V, F, A, rhs = _system()
    mg = mg_precompute(V, F, min_coarsest_nv=100, verbose=False)
    save_hierarchy(tmp_path / "h.npz", mg)
    mg2 = load_hierarchy(tmp_path / "h.npz")
    assert len(mg2) == len(mg)
    for a, b in zip(mg, mg2):
        np.testing.assert_array_equal(a.V, b.V)
        np.testing.assert_array_equal(a.F, b.F)
        if a.P_full is not None:
            assert abs(a.P_full - b.P_full).max() == 0
    # loaded hierarchy drives a solve identically
    d1 = min_quad_with_fixed_mg_precompute(A, None, mg)
    d2 = min_quad_with_fixed_mg_precompute(A, None, mg2)
    z1, r1, _ = min_quad_with_fixed_mg_solve(d1, rhs, tolerance=1e-8)
    z2, r2, _ = min_quad_with_fixed_mg_solve(d2, rhs, tolerance=1e-8)
    np.testing.assert_allclose(r1, r2, rtol=1e-10)


def test_profiler_regions_recorded():
    profiler_reset()
    V, F, A, rhs = _system()
    mg = mg_precompute(V, F, min_coarsest_nv=100, verbose=False)
    data = min_quad_with_fixed_mg_precompute(A, None, mg)
    min_quad_with_fixed_mg_solve(data, rhs)
    rep = profiler_report()
    assert "MG: total VCycle" in rep
    assert "SSP: decimate" in rep
