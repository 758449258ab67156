"""Multi-device tests: row-sharded V-cycle on a faked 8-device CPU mesh
(SURVEY.md §4d).  Compares the sharded solve against the single-device
solver on the same hierarchy."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from surface_multigrid_code_tpu.config import SolveConfig, SmootherType
from surface_multigrid_code_tpu.ops.laplacian import cotmatrix, massmatrix
from surface_multigrid_code_tpu.parallel.spmd import (
    build_sharded_hierarchy,
    make_row_mesh,
    sharded_solve,
)
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


@pytest.mark.parametrize("ndev", [1, 8])
def test_sharded_solve_matches(ndev):
    As, Ps, rhs = hierarchy_system()
    mesh = make_row_mesh(ndev)
    hier, sizes = build_sharded_hierarchy(As, Ps, mesh, dtype=jnp.float64)
    z, r_his, k = sharded_solve(
        hier, sizes, mesh, rhs, tolerance=1e-10, max_iter=30, dtype=jnp.float64
    )
    assert r_his[-1] <= 1e-10
    # true solution check
    err = np.linalg.norm(As[0] @ z - rhs)
    assert err < 1e-9


def test_sharded_multirhs():
    As, Ps, rhs = hierarchy_system()
    rhs3 = np.stack([rhs, 2 * rhs, -rhs], axis=1)
    mesh = make_row_mesh(8)
    hier, sizes = build_sharded_hierarchy(As, Ps, mesh, dtype=jnp.float64)
    z, r_his, k = sharded_solve(
        hier, sizes, mesh, rhs3, tolerance=1e-9, max_iter=40, dtype=jnp.float64
    )
    err = np.linalg.norm(As[0] @ z - rhs3)
    assert err < 1e-7
