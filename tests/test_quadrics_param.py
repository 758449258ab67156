"""compute_vertex_quadrics + project_to_disk (reference parity: the two
previously-skipped inventory rows, src/compute_vertex_quadrics.cpp and
06_example_balloon_sim/sim_utils/project_to_disk.cpp)."""

import numpy as np

from surface_multigrid_code_tpu.ssp.quadrics import compute_vertex_quadrics
from surface_multigrid_code_tpu.utils.param import (
    boundary_loops,
    map_vertices_to_circle,
    project_to_disk,
)


def grid_mesh(nx=6, ny=5, warp=0.0):
    xs, ys = np.meshgrid(np.linspace(0, 1, nx), np.linspace(0, 1, ny))
    V = np.stack(
        [xs.ravel(), ys.ravel(), warp * np.sin(3 * xs.ravel())], axis=1
    )
    F = []
    for j in range(ny - 1):
        for i in range(nx - 1):
            a = j * nx + i
            F.append([a, a + 1, a + nx])
            F.append([a + 1, a + nx + 1, a + nx])
    return V, np.asarray(F, dtype=np.int64)


def quadric_scalar_oracle(V, F):
    """Direct per-face transcription of the reference math
    (compute_vertex_quadrics.cpp:59-107 + the boundary case :108-163)."""
    n = V.shape[0]
    A = 1e-10 * np.stack([np.eye(3)] * n)
    b = 1e-10 * -V.copy()
    c = 1e-10 * (V * V).sum(axis=1)

    def sub_q(p, S, wgt):
        Aq = np.eye(3)
        bq = -p.copy()
        cq = p @ p
        for ei in S:
            Aq -= np.outer(ei, ei)
            bq += (p @ ei) * ei
            cq -= (p @ ei) ** 2
        return wgt * Aq, wgt * bq, wgt * cq

    edge_count = {}
    for f, tri in enumerate(F):
        for k in range(3):
            e = tuple(sorted((tri[k], tri[(k + 1) % 3])))
            edge_count.setdefault(e, []).append((f, k))
    for tri in F:
        p, q, r = V[tri[0]], V[tri[1]], V[tri[2]]
        pq, pr = q - p, r - p
        area = np.sqrt((pq @ pq) * (pr @ pr) - (pq @ pr) ** 2)
        e1 = pq / np.linalg.norm(pq)
        e2 = pr - (e1 @ pr) * e1
        e2 = e2 / np.linalg.norm(e2)
        Aq, bq, cq = sub_q(p, [e1, e2], area)
        for v in tri:
            A[v] += Aq
            b[v] += bq
            c[v] += cq
    for (_u, _v), inc in edge_count.items():
        if len(inc) != 1:
            continue
        f, k = inc[0]
        i0, i1 = F[f, k], F[f, (k + 1) % 3]
        iu = F[f, (k + 2) % 3]
        p = V[i0]
        ev = V[i1] - p
        length = np.linalg.norm(ev)
        ev = ev / length
        eu = V[iu] - p
        nrm = np.cross(ev, eu)
        nrm = nrm / np.linalg.norm(nrm)
        Aq, bq, cq = sub_q(p, [ev, nrm], length**2 / 100.0)
        for v in (i0, i1):
            A[v] += Aq
            b[v] += bq
            c[v] += cq
    return A, b, c


def test_quadrics_match_scalar_oracle():
    V, F = grid_mesh(warp=0.3)
    A, b, c = compute_vertex_quadrics(V, F)
    Ao, bo, co = quadric_scalar_oracle(V, F)
    np.testing.assert_allclose(A, Ao, atol=1e-12)
    np.testing.assert_allclose(b, bo, atol=1e-12)
    np.testing.assert_allclose(c, co, atol=1e-12)


def test_quadrics_vanish_on_flat_interior():
    """On a planar mesh, any point in the plane has ~zero quadric error
    at an interior vertex (the plane quadrics measure distance to the
    face planes; the 1e-10 pull is the only residual)."""
    V, F = grid_mesh(warp=0.0)
    A, b, c = compute_vertex_quadrics(V, F)
    interior = 2 * 6 + 3  # (i=3, j=2) of the 6x5 grid
    x = V[interior] + np.array([0.01, -0.02, 0.0])  # stay in the plane
    q = x @ A[interior] @ x + 2 * b[interior] @ x + c[interior]
    assert abs(q) < 1e-8
    # off-plane motion is penalized
    xo = V[interior] + np.array([0.0, 0.0, 0.1])
    qo = xo @ A[interior] @ xo + 2 * b[interior] @ xo + c[interior]
    assert qo > 1e-4


def test_quadrics_psd():
    V, F = grid_mesh(warp=0.5)
    A, _b, _c = compute_vertex_quadrics(V, F)
    w = np.linalg.eigvalsh(A)
    assert w.min() >= -1e-12


def test_project_to_disk_tutte():
    V, F = grid_mesh(nx=8, ny=7, warp=0.4)
    loops = boundary_loops(F)
    assert len(loops) == 1
    bc = map_vertices_to_circle(V, loops[0])
    np.testing.assert_allclose(np.linalg.norm(bc, axis=1), 1.0, atol=1e-12)

    U = project_to_disk(V, F)
    assert np.allclose(U[:, 1], 0.0)
    uv = np.stack([U[:, 0], -U[:, 2]], axis=1)
    r = np.linalg.norm(uv, axis=1)
    np.testing.assert_allclose(r[loops[0]], 1.0, atol=1e-12)
    interior = np.setdiff1d(np.arange(V.shape[0]), loops[0])
    assert (r[interior] < 1.0 - 1e-9).all()
    # flip-free (Tutte with convex boundary): all signed UV areas share
    # the boundary orientation's sign
    a = uv[F[:, 1]] - uv[F[:, 0]]
    bb = uv[F[:, 2]] - uv[F[:, 0]]
    s = a[:, 0] * bb[:, 1] - a[:, 1] * bb[:, 0]
    assert (s > 0).all() or (s < 0).all()
