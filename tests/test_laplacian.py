"""Cotan Laplacian / mass matrix vs dense oracles and invariants."""

import numpy as np

from surface_multigrid_code_tpu.ops.laplacian import (
    cotmatrix,
    cotmatrix_dense,
    cotmatrix_entries,
    massmatrix,
    massmatrix_barycentric,
)
from surface_multigrid_code_tpu.utils.mesh import doublearea
from surface_multigrid_code_tpu.utils.synthetic import icosphere


def test_cotmatrix_matches_dense():
    V, F = icosphere(2)
    L = cotmatrix(V, F).todense()
    Ld = cotmatrix_dense(V, F)
    np.testing.assert_allclose(np.asarray(L), Ld, atol=1e-12)


def test_cotmatrix_properties():
    V, F = icosphere(2)
    L = cotmatrix(V, F)
    # symmetric, rows sum to zero, negative semi-definite diagonal
    assert abs(L - L.T).max() < 1e-12
    np.testing.assert_allclose(np.asarray(L.sum(axis=1)).ravel(), 0.0, atol=1e-12)
    assert (L.diagonal() < 0).all()
    # -L is PSD
    w = np.linalg.eigvalsh(-np.asarray(L.todense()))
    assert w.min() > -1e-10


def test_cotmatrix_entries_right_triangle():
    # right triangle: cot of the right angle is 0
    V = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0]])
    F = np.array([[0, 1, 2]])
    C = cotmatrix_entries(V, F)
    # angle at vertex 0 is 90 deg -> C[:,0] = 0; others 45 deg -> cot=1 -> 0.5
    np.testing.assert_allclose(C[0], [0.0, 0.5, 0.5], atol=1e-14)


def test_laplacian_of_linear_function_is_zero_interior():
    # planar grid: L @ (linear fn) = 0 at interior vertices
    n = 6
    xs, ys = np.meshgrid(np.arange(n, dtype=float), np.arange(n, dtype=float))
    V = np.stack([xs.ravel(), ys.ravel(), np.zeros(n * n)], axis=1)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces.append([a, a + 1, a + n])
            faces.append([a + 1, a + n + 1, a + n])
    F = np.asarray(faces)
    L = cotmatrix(V, F)
    f = 2.0 * V[:, 0] - 3.0 * V[:, 1] + 1.0
    Lf = L @ f
    interior = np.array(
        [i * n + j for i in range(1, n - 1) for j in range(1, n - 1)]
    )
    np.testing.assert_allclose(Lf[interior], 0.0, atol=1e-12)


def test_massmatrix_total_area():
    V, F = icosphere(2)
    total = doublearea(V, F).sum() / 2.0
    for kind in ["voronoi", "barycentric"]:
        M = massmatrix(V, F, kind)
        np.testing.assert_allclose(M.diagonal().sum(), total, rtol=1e-12)
        assert (M.diagonal() > 0).all()


def test_massmatrix_voronoi_equilateral_matches_barycentric():
    # for equilateral triangles voronoi == barycentric
    V = np.array([[0, 0, 0], [1, 0, 0], [0.5, np.sqrt(3) / 2, 0]], dtype=float)
    F = np.array([[0, 1, 2]])
    Mv = massmatrix(V, F, "voronoi").diagonal()
    Mb = massmatrix_barycentric(V, F).diagonal()
    np.testing.assert_allclose(Mv, Mb, atol=1e-12)


def test_jax_entries_match_numpy():
    import jax.numpy as jnp
    from surface_multigrid_code_tpu.ops.laplacian import cotmatrix_entries_jax

    V, F = icosphere(2)
    C = cotmatrix_entries(V, F)
    Cj = np.asarray(cotmatrix_entries_jax(jnp.asarray(V), jnp.asarray(F)))
    np.testing.assert_allclose(C, Cj, atol=1e-12)
