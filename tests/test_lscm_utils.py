"""Python LSCM building blocks: flatten quality, QC error, mqwf_dense,
boundary loops, and the direct balloon stepper parity."""

import numpy as np

from surface_multigrid_code_tpu.ops.lscm import (
    lscm_flatten,
    mqwf_dense_precompute,
    mqwf_dense_solve,
    quasi_conformal_error,
    vector_area_matrix,
)
from surface_multigrid_code_tpu.utils.mesh import boundary_loops
from surface_multigrid_code_tpu.utils.synthetic import icosphere


def hemisphere_patch():
    V, F = icosphere(2)
    keep = V[:, 2] > 0.2
    fkeep = keep[F].all(axis=1)
    Fs = F[fkeep]
    used = np.unique(Fs)
    remap = -np.ones(V.shape[0], dtype=np.int64)
    remap[used] = np.arange(used.shape[0])
    return V[used], remap[Fs]


def test_lscm_flatten_no_flips():
    V, F = hemisphere_patch()
    loop = boundary_loops(F)[0]
    b = np.array([loop[0], loop[len(loop) // 2]])
    bc = np.array([[0.0, 0.0], [1.0, 0.0]])
    UV = lscm_flatten(V, F, b, bc)
    # pinned values honored
    np.testing.assert_allclose(UV[b], bc, atol=1e-12)
    # all UV triangles positively oriented (no flips)
    a, bb, c = UV[F[:, 0]], UV[F[:, 1]], UV[F[:, 2]]
    area2 = (bb[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (
        bb[:, 1] - a[:, 1]
    ) * (c[:, 0] - a[:, 0])
    assert (area2 > 0).all()
    # near-conformal: median QC distortion close to 1
    qc = quasi_conformal_error(V, F, UV)
    assert np.median(qc) < 1.6


def test_qc_error_identity_map():
    # flatten a planar patch with an isometric UV -> QC error == 1
    xs, ys = np.meshgrid(np.arange(4.0), np.arange(4.0))
    V = np.stack([xs.ravel(), ys.ravel(), np.zeros(16)], 1)
    faces = []
    for i in range(3):
        for j in range(3):
            a = i * 4 + j
            faces += [[a, a + 1, a + 5], [a, a + 5, a + 4]]
    F = np.array(faces)
    UV = V[:, :2]
    qc = quasi_conformal_error(V, F, UV)
    np.testing.assert_allclose(qc, 1.0, atol=1e-12)


def test_mqwf_dense_minimizes():
    rng = np.random.default_rng(0)
    n = 12
    Q0 = rng.normal(size=(n, n))
    Q = Q0 @ Q0.T + n * np.eye(n)
    known = np.array([0, 5])
    kv = np.array([1.0, -2.0])
    rhs = rng.normal(size=n)
    data = mqwf_dense_precompute(Q, known)
    x = mqwf_dense_solve(data, rhs, kv)
    np.testing.assert_allclose(x[known], kv)
    # KKT: gradient of 1/2 x'Qx + rhs'x vanishes on unknowns
    g = Q @ x + rhs
    assert np.abs(g[data.unknown]).max() < 1e-9


def test_vector_area_matrix_measures_area():
    # unit square patch: x' A x = enclosed area
    V = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0.0]])
    F = np.array([[0, 1, 2], [0, 2, 3]])
    A = vector_area_matrix(F, 4)
    x = np.concatenate([V[:, 0], V[:, 1]])
    assert abs(x @ A @ x - 1.0) < 1e-12


def test_boundary_loops_ordered():
    V, F = hemisphere_patch()
    loops = boundary_loops(F)
    assert len(loops) >= 1
    loop = loops[0]
    # consecutive loop vertices share a boundary edge
    from surface_multigrid_code_tpu.utils.mesh import boundary_facets

    bf = set(map(tuple, boundary_facets(F)))
    for k in range(len(loop)):
        assert (loop[k], loop[(k + 1) % len(loop)]) in bf


def test_direct_balloon_matches_mg_loosely():
    from surface_multigrid_code_tpu.models.balloon import (
        implicit_euler_balloon_direct,
        implicit_euler_mg_balloon,
        lumped_mass_matrix,
        vertex_normals,
    )
    from surface_multigrid_code_tpu.models.shell import ShellEnergy, lame_parameters
    from surface_multigrid_code_tpu.ops.laplacian import massmatrix
    from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute_block

    V, F = icosphere(2)
    alpha, beta = lame_parameters(6e4, 0.3)
    shell = ShellEnergy(V, F, 0.1, alpha, beta, "neohookean")
    M = 1000.0 * lumped_mass_matrix(V, F)
    mg = mg_precompute_block(V, F, min_coarsest_nv=60, verbose=False)
    N = vertex_normals(V, F)
    Mvd = np.asarray(massmatrix(V, F, kind="voronoi").diagonal())
    fExt = (-(N * Mvd[:, None]) * 1e3).reshape(-1)
    qdot = np.zeros(3 * V.shape[0])
    p1, q1 = implicit_euler_balloon_direct(
        shell, M, V.copy(), qdot, fExt, 1e-3, n_newton=3, verbose=False
    )
    p2, q2, _ = implicit_euler_mg_balloon(
        shell, M, V.copy(), qdot, fExt, 1e-3, mg, n_newton=3,
        mg_tolerance=1e-8, verbose=False,
    )
    # with a tight mg tolerance the trajectories agree closely
    assert np.abs(p1 - p2).max() < 1e-5 * max(1.0, np.abs(p1).max())
