"""ELL container, SpMV, and smoother tests vs scipy/numpy oracles."""

import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

from surface_multigrid_code_tpu.ops.sparse import (
    ell_from_csr,
    ell_to_csr,
    ell_spmv,
)
from surface_multigrid_code_tpu.ops.smoothers import (
    greedy_coloring,
    color_groups,
    group_scales,
    multicolor_gs_sweep,
    jacobi_sweep,
)
from surface_multigrid_code_tpu.ops.laplacian import cotmatrix
from surface_multigrid_code_tpu.utils.synthetic import icosphere


def rand_spd(n, rng):
    A = sp.random(n, n, density=0.1, random_state=rng)
    A = A + A.T + 2 * n * sp.eye(n)
    return A.tocsr()


def test_ell_roundtrip():
    rng = np.random.default_rng(0)
    A = rand_spd(40, np.random.RandomState(0))
    E = ell_from_csr(A)
    B = ell_to_csr(E)
    assert abs(A - B).max() < 1e-14


def test_ell_spmv_matches_scipy():
    A = rand_spd(64, np.random.RandomState(1))
    E = ell_from_csr(A)
    x = np.random.default_rng(1).normal(size=64)
    np.testing.assert_allclose(
        np.asarray(ell_spmv(E, jnp.asarray(x))), A @ x, rtol=1e-12
    )
    X = np.random.default_rng(2).normal(size=(64, 3))
    np.testing.assert_allclose(
        np.asarray(ell_spmv(E, jnp.asarray(X))), A @ X, rtol=1e-12
    )


def test_ell_rectangular():
    rng = np.random.RandomState(3)
    A = sp.random(30, 12, density=0.2, random_state=rng).tocsr()
    E = ell_from_csr(A)
    x = np.random.default_rng(3).normal(size=12)
    np.testing.assert_allclose(
        np.asarray(ell_spmv(E, jnp.asarray(x))), A @ x, rtol=1e-12, atol=1e-14
    )


def test_coloring_is_proper():
    V, F = icosphere(2)
    A = (-cotmatrix(V, F)).tocsr()
    color = greedy_coloring(A)
    A2 = A.tocoo()
    off = A2.row != A2.col
    assert (color[A2.row[off]] != color[A2.col[off]]).all()
    assert color.max() < 12


def gs_reference_sweep(A, diag, color, b, u):
    """Sequential GS restricted to color order (oracle for multicolor GS)."""
    u = u.copy()
    n = A.shape[0]
    for c in range(color.max() + 1):
        for i in np.nonzero(color == c)[0]:
            row = A.getrow(i)
            s = (row @ u)[0] - diag[i] * u[i]
            u[i] = (b[i] - s) / diag[i]
    return u


def test_multicolor_gs_matches_sequential_within_color_order():
    V, F = icosphere(1)
    A = (-cotmatrix(V, F) + 0.1 * sp.eye(V.shape[0])).tocsr()
    n = A.shape[0]
    rng = np.random.default_rng(0)
    b = rng.normal(size=n)
    u0 = rng.normal(size=n)
    color = greedy_coloring(A)
    groups_np = color_groups(color)
    groups = tuple(jnp.asarray(g) for g in groups_np)
    scales = tuple(jnp.asarray(s) for s in group_scales(groups_np))
    E = ell_from_csr(A)
    diag = jnp.asarray(A.diagonal())
    u1 = np.asarray(
        multicolor_gs_sweep(E, diag, groups, scales, jnp.asarray(b), jnp.asarray(u0))
    )
    u_ref = gs_reference_sweep(A, A.diagonal(), color, b, u0)
    np.testing.assert_allclose(u1, u_ref, rtol=1e-10, atol=1e-12)


def test_jacobi_reduces_residual():
    A = rand_spd(50, np.random.RandomState(5))
    E = ell_from_csr(A)
    diag = jnp.asarray(A.diagonal())
    rng = np.random.default_rng(5)
    b = jnp.asarray(rng.normal(size=50))
    u = jnp.zeros(50)
    r0 = np.linalg.norm(np.asarray(b))
    for _ in range(20):
        u = jacobi_sweep(E, diag, b, u)
    r = np.linalg.norm(np.asarray(b) - A @ np.asarray(u))
    assert r < 0.2 * r0


def test_multicolor_gs_multirhs():
    V, F = icosphere(1)
    A = (-cotmatrix(V, F) + 0.1 * sp.eye(V.shape[0])).tocsr()
    n = A.shape[0]
    rng = np.random.default_rng(7)
    B = rng.normal(size=(n, 2))
    U0 = rng.normal(size=(n, 2))
    color = greedy_coloring(A)
    groups_np = color_groups(color)
    groups = tuple(jnp.asarray(g) for g in groups_np)
    scales = tuple(jnp.asarray(s) for s in group_scales(groups_np))
    E = ell_from_csr(A)
    diag = jnp.asarray(A.diagonal())
    U1 = np.asarray(
        multicolor_gs_sweep(E, diag, groups, scales, jnp.asarray(B), jnp.asarray(U0))
    )
    for c in range(2):
        u_ref = gs_reference_sweep(A, A.diagonal(), color, B[:, c], U0[:, c])
        np.testing.assert_allclose(U1[:, c], u_ref, rtol=1e-10, atol=1e-12)
