"""Windowed-kernel band-segment halo path vs the ELL halo path.

Interpret-mode Pallas inside a many-way shard_map is expensive (every
kernel body is simulated per shard) and 8 virtual devices share 4 host
cores, so the default-suite tests keep to a 4-device depth-3 hierarchy
that still covers BOTH exchange modes (fine levels band-segment
ppermute, coarse levels auto-replicate).  The full 8-device depth-4
parity run is @slow.  conftest raises XLA's CPU collective rendezvous
deadlines so slow interpret shards aren't SIGABRTed mid-suite.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from surface_multigrid_code_tpu.config import SolveConfig, SmootherType
from surface_multigrid_code_tpu.parallel.halo import HaloHierarchy
from surface_multigrid_code_tpu.parallel.spmd import make_row_mesh
from surface_multigrid_code_tpu.parallel.wellhalo import WellHaloHierarchy

from tests.test_halo import hierarchy_system


def _parity_case(depth, ndev, max_iter):
    """Jacobi is permutation-equivariant, so the windowed band-segment
    path (induced ordering) and the ELL publish-slot path (per-level
    RCM) must produce the SAME residual history and solution at f64
    (up to f64 reduction-order rounding in the residual norms)."""
    As, Ps, rhs = hierarchy_system(depth=depth)
    mesh = make_row_mesh(ndev)
    cfg = SolveConfig(smoother=SmootherType.JACOBI)
    h1 = WellHaloHierarchy(As, Ps, mesh, cfg=cfg, dtype=jnp.float64)
    # all three exchange modes must be in play for this to test anything:
    # band segments, replication, and column-partitioned restriction
    assert any(h1.reps) and not all(h1.reps), h1.reps
    assert any(h1.ptcols), (h1.ptcols, h1.reps)
    h0 = HaloHierarchy(As, Ps, mesh, cfg=cfg, dtype=jnp.float64)
    z0, r0, ok0 = h0.solve(rhs, tolerance=1e-8, max_iter=max_iter)
    z1, r1, ok1 = h1.solve(rhs, tolerance=1e-8, max_iter=max_iter)
    assert ok0 and ok1
    assert len(r0) == len(r1)
    np.testing.assert_allclose(r1, r0, rtol=1e-8)
    np.testing.assert_allclose(z1, z0, rtol=0, atol=1e-10)


def test_wellhalo_matches_ell_halo_history():
    _parity_case(depth=4, ndev=4, max_iter=12)


@pytest.mark.slow
def test_wellhalo_matches_ell_halo_history_8dev():
    _parity_case(depth=4, ndev=8, max_iter=30)


def test_wellhalo_chebyshev_converges():
    As, Ps, rhs = hierarchy_system(depth=3)
    mesh = make_row_mesh(2)
    hier = WellHaloHierarchy(
        As, Ps, mesh, cfg=SolveConfig(smoother=SmootherType.CHEBYSHEV),
        dtype=jnp.float64,
    )
    z, r_his, ok = hier.solve(rhs, tolerance=1e-10, max_iter=40)
    assert ok, r_his
    assert np.linalg.norm(As[0] @ z - rhs) < 1e-9


def test_wellhalo_rejects_multicolor():
    As, Ps, rhs = hierarchy_system(depth=3)
    mesh = make_row_mesh(2)
    with pytest.raises(NotImplementedError):
        WellHaloHierarchy(
            As, Ps, mesh,
            cfg=SolveConfig(smoother=SmootherType.MULTICOLOR_GS),
            dtype=jnp.float64,
        )


def test_wellhalo_multicolumn_matches_ell_halo():
    """[n, 3] RHS (the MCF shape): residual history and solution must
    match the ELL halo path's multi-column solve, and distinct columns
    must solve to their own solutions."""
    As, Ps, rhs = hierarchy_system(depth=3)
    mesh = make_row_mesh(2)
    cfg = SolveConfig(smoother=SmootherType.JACOBI)
    rng = np.random.default_rng(7)
    RHS = np.stack([rhs, 2.0 * rhs, rng.standard_normal(rhs.shape[0])], 1)
    h0 = HaloHierarchy(As, Ps, mesh, cfg=cfg, dtype=jnp.float64)
    h1 = WellHaloHierarchy(As, Ps, mesh, cfg=cfg, dtype=jnp.float64)
    z0, r0, ok0 = h0.solve(RHS, tolerance=1e-8, max_iter=25)
    z1, r1, ok1 = h1.solve(RHS, tolerance=1e-8, max_iter=25)
    assert ok0 and ok1
    assert z1.shape == RHS.shape
    assert len(r0) == len(r1)
    # 3-column Frobenius norms accumulate a little more f64
    # reduction-order noise than the 1-D case's rtol 1e-8
    np.testing.assert_allclose(r1, r0, rtol=1e-6)
    np.testing.assert_allclose(z1, z0, rtol=0, atol=1e-9)
    for j in range(3):
        assert np.linalg.norm(As[0] @ z1[:, j] - RHS[:, j]) < 1e-7


def _refreshable_system(depth=3):
    """Symbolic-pattern hierarchy (galerkin_chain) + two value sets on the
    same finest pattern — the refresh contract's inputs."""
    from surface_multigrid_code_tpu.ops.laplacian import cotmatrix, massmatrix
    from surface_multigrid_code_tpu.solver.galerkin import galerkin_chain
    from surface_multigrid_code_tpu.utils.synthetic import (
        subdivision_hierarchy,
    )
    import scipy.sparse as sp

    meshes, Ps = subdivision_hierarchy(depth)
    V, F = meshes[0]
    L = cotmatrix(V, F).tocsr()
    L.sum_duplicates()
    M = massmatrix(V, F)
    mdiag = np.asarray(M.diagonal())
    n = V.shape[0]
    rows = np.repeat(np.arange(n), np.diff(L.indptr))
    vals1 = -0.01 * L.data + np.where(rows == L.indices, mdiag[rows], 0.0)
    vals2 = -0.005 * L.data + np.where(
        rows == L.indices, 2.0 * mdiag[rows], 0.0
    )
    A0 = sp.csr_matrix((vals1, L.indices.copy(), L.indptr.copy()), L.shape)
    As = galerkin_chain(A0, [P.tocsr() for P in Ps])
    rhs = np.asarray(M @ V[:, 0])
    return As, [P.tocsr() for P in Ps], vals1, vals2, rhs


def test_wellhalo_solve_values_matches_ell_halo():
    """The windowed sharded value refresh (slot-space G chain,
    band-segment halos) must reproduce the ELL halo path's refreshed
    residual history and solution on the SAME fresh values."""
    As, Ps, vals1, vals2, rhs = _refreshable_system(depth=3)
    mesh = make_row_mesh(4)
    cfg = SolveConfig(smoother=SmootherType.JACOBI)
    wh = WellHaloHierarchy(
        As, Ps, mesh, cfg=cfg, dtype=jnp.float64
    ).enable_refresh()
    hh = HaloHierarchy(
        As, Ps, mesh, cfg=cfg, dtype=jnp.float64
    ).enable_refresh()
    for vals in (vals1, vals2):
        z0, r0, ok0 = hh.solve_values(
            vals, rhs, tolerance=1e-8, max_iter=12
        )
        z1, r1, ok1 = wh.solve_values(
            vals, rhs, tolerance=1e-8, max_iter=12
        )
        assert ok0 and ok1, (r0, r1)
        assert len(r0) == len(r1)
        np.testing.assert_allclose(r1, r0, rtol=1e-8)
        np.testing.assert_allclose(z1, z0, rtol=0, atol=1e-10)


def test_wellhalo_solve_values_equals_static_rebuild():
    """Refreshing values onto the fixed hierarchy must equal building a
    fresh WellHaloHierarchy from those values (same ordering: RCM keys on
    the pattern only) and running its static solve — exactness of the
    slot-space chain, repack, diagonals, and coarse rebuild."""
    import scipy.sparse as sp
    from surface_multigrid_code_tpu.solver.galerkin import galerkin_chain

    As, Ps, vals1, vals2, rhs = _refreshable_system(depth=3)
    mesh = make_row_mesh(4)
    cfg = SolveConfig(smoother=SmootherType.JACOBI)
    wh = WellHaloHierarchy(
        As, Ps, mesh, cfg=cfg, dtype=jnp.float64
    ).enable_refresh()
    A2 = sp.csr_matrix(
        (vals2, As[0].indices.copy(), As[0].indptr.copy()), As[0].shape
    )
    As2 = galerkin_chain(A2, Ps)
    wh2 = WellHaloHierarchy(As2, Ps, mesh, cfg=cfg, dtype=jnp.float64)
    z_static, r_static, ok_s = wh2.solve(rhs, tolerance=1e-8, max_iter=12)
    z_ref, r_ref, ok_r = wh.solve_values(
        vals2, rhs, tolerance=1e-8, max_iter=12
    )
    assert ok_s and ok_r, (r_static, r_ref)
    # identical operators up to the coarse solve flavor (static: deflated
    # pseudo-inverse; refreshed: shifted Cholesky — both exact for this
    # SPD system), so histories agree tightly
    np.testing.assert_allclose(r_ref, r_static, rtol=1e-6)
    np.testing.assert_allclose(z_ref, z_static, rtol=0, atol=1e-8)


def test_wellhalo_solve_values_multicolumn():
    As, Ps, vals1, vals2, rhs = _refreshable_system(depth=3)
    mesh = make_row_mesh(2)
    cfg = SolveConfig(smoother=SmootherType.JACOBI)
    wh = WellHaloHierarchy(
        As, Ps, mesh, cfg=cfg, dtype=jnp.float64
    ).enable_refresh()
    hh = HaloHierarchy(
        As, Ps, mesh, cfg=cfg, dtype=jnp.float64
    ).enable_refresh()
    RHS = np.stack([rhs, 0.3 * rhs + 0.1], axis=1)
    z0, r0, ok0 = hh.solve_values(vals2, RHS, tolerance=1e-8, max_iter=12)
    z1, r1, ok1 = wh.solve_values(vals2, RHS, tolerance=1e-8, max_iter=12)
    assert ok0 and ok1, (r0, r1)
    np.testing.assert_allclose(r1, r0, rtol=1e-8)
    np.testing.assert_allclose(z1, z0, rtol=0, atol=1e-10)
