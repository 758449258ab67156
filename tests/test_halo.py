"""Explicit halo-exchange shard_map V-cycle vs the single-device solver."""

import numpy as np
import pytest

import jax.numpy as jnp

from surface_multigrid_code_tpu.config import SolveConfig, SmootherType
from surface_multigrid_code_tpu.ops.laplacian import cotmatrix, massmatrix
from surface_multigrid_code_tpu.parallel.halo import HaloHierarchy
from surface_multigrid_code_tpu.parallel.spmd import make_row_mesh
from surface_multigrid_code_tpu.utils.synthetic import subdivision_hierarchy


def hierarchy_system(depth=5):
    meshes, Ps = subdivision_hierarchy(depth)
    V, F = meshes[0]
    L = cotmatrix(V, F)
    M = massmatrix(V, F)
    A = (M - 0.01 * L).tocsr()
    As = [A]
    for P in Ps:
        As.append((P.T @ As[-1] @ P).tocsr())
    rhs = np.asarray(M @ V[:, 0])
    return As, Ps, rhs


@pytest.mark.parametrize("ndev", [2, 8])
@pytest.mark.parametrize(
    "smoother", [SmootherType.JACOBI, SmootherType.CHEBYSHEV]
)
def test_halo_solve_converges(ndev, smoother):
    As, Ps, rhs = hierarchy_system()
    mesh = make_row_mesh(ndev)
    cfg = SolveConfig(smoother=smoother)
    hier = HaloHierarchy(As, Ps, mesh, cfg=cfg, dtype=jnp.float64)
    z, r_his, ok = hier.solve(rhs, tolerance=1e-10, max_iter=40)
    assert ok, r_his
    assert np.linalg.norm(As[0] @ z - rhs) < 1e-9


def test_halo_multicolumn_rhs():
    As, Ps, rhs = hierarchy_system()
    rhs3 = np.stack([rhs, -2 * rhs, 0.5 * rhs], axis=1)
    mesh = make_row_mesh(4)
    hier = HaloHierarchy(
        As, Ps, mesh, cfg=SolveConfig(smoother=SmootherType.CHEBYSHEV),
        dtype=jnp.float64,
    )
    z, r_his, ok = hier.solve(rhs3, tolerance=1e-10, max_iter=40)
    assert ok
    assert np.linalg.norm(As[0] @ z - rhs3) < 1e-8


def test_halo_matches_gspmd_path():
    from surface_multigrid_code_tpu.parallel.spmd import (
        build_sharded_hierarchy,
        sharded_solve,
    )

    As, Ps, rhs = hierarchy_system()
    mesh = make_row_mesh(4)
    cfg = SolveConfig(smoother=SmootherType.JACOBI)
    # reorder=False so float summation order matches the GSPMD path exactly
    halo = HaloHierarchy(As, Ps, mesh, cfg=cfg, dtype=jnp.float64, reorder=False)
    z1, r1, _ = halo.solve(rhs, tolerance=1e-8, max_iter=30)
    hier, sizes = build_sharded_hierarchy(As, Ps, mesh, dtype=jnp.float64)
    z2, r2, _ = sharded_solve(
        hier, sizes, mesh, rhs, tolerance=1e-8, max_iter=30, cfg=cfg,
        dtype=jnp.float64,
    )
    assert len(r1) == len(r2)
    np.testing.assert_allclose(r1, r2, rtol=1e-9)
    np.testing.assert_allclose(z1, z2, rtol=1e-8, atol=1e-12)
