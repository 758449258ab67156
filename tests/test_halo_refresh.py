"""Sharded value refresh (HaloHierarchy.solve_values) vs static solves."""

import numpy as np

import jax.numpy as jnp

from surface_multigrid_code_tpu.config import SolveConfig, SmootherType
from surface_multigrid_code_tpu.ops.laplacian import cotmatrix, massmatrix
from surface_multigrid_code_tpu.parallel.halo import HaloHierarchy
from surface_multigrid_code_tpu.parallel.spmd import make_row_mesh
from surface_multigrid_code_tpu.utils.synthetic import subdivision_hierarchy


def system(delta):
    meshes, Ps = subdivision_hierarchy(5)
    V, F = meshes[0]
    L = cotmatrix(V, F)
    M = massmatrix(V, F)
    A = (M - delta * L).tocsr()
    A.sum_duplicates()
    As = [A]
    for P in Ps:
        An = (P.T @ As[-1] @ P).tocsr()
        An.sum_duplicates()
        As.append(An)
    rhs = np.asarray(M @ V[:, 0])
    return As, Ps, rhs, L, M


def test_solve_values_matches_static():
    As, Ps, rhs, L, M = system(0.01)
    mesh = make_row_mesh(4)
    cfg = SolveConfig(smoother=SmootherType.JACOBI)
    halo = HaloHierarchy(As, Ps, mesh, cfg=cfg, dtype=jnp.float64)
    halo.enable_refresh()

    # same values through the refresh path must reproduce the static solve
    z1, r1, ok1 = halo.solve(rhs, tolerance=1e-9, max_iter=30)
    z2, r2, ok2 = halo.solve_values(
        jnp.asarray(As[0].data), rhs, tolerance=1e-9, max_iter=30
    )
    assert ok1 and ok2
    assert len(r1) == len(r2)
    # the refreshed coarse solve is Cholesky-of-shifted vs the static
    # eigh pseudo-inverse — identical up to tiny floating differences
    np.testing.assert_allclose(r1, r2, rtol=1e-5)
    np.testing.assert_allclose(z1, z2, atol=1e-8)

    # a DIFFERENT value refresh on the same pattern solves the new system
    A2 = (M - 0.05 * L).tocsr()
    A2.sum_duplicates()
    z3, r3, ok3 = halo.solve_values(
        jnp.asarray(A2.data), rhs, tolerance=1e-9, max_iter=40
    )
    assert ok3
    assert np.linalg.norm(A2 @ z3 - rhs) < 1e-8
