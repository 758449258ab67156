"""Unit tests for host mesh utilities against brute-force oracles."""

import numpy as np
import pytest

from surface_multigrid_code_tpu.utils.mesh import (
    edges_and_flaps,
    is_edge_manifold,
    boundary_facets,
    connect_boundary_to_infinity,
    remove_unreferenced,
    normalize_unit_area,
    doublearea,
    internal_angles,
    triangle_quality,
)
from surface_multigrid_code_tpu.utils.synthetic import icosphere, icosahedron
from surface_multigrid_code_tpu.utils.obj_io import read_obj, write_obj
from surface_multigrid_code_tpu.utils.barycentric import compute_barycentric, snap_to_best_face


def square_mesh():
    # two triangles over a unit square (has a boundary)
    V = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], dtype=float)
    F = np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int64)
    return V, F


def test_edges_and_flaps_square():
    V, F = square_mesh()
    E, EMAP, EF, EI = edges_and_flaps(F)
    assert E.shape[0] == 5
    # every EMAP entry names the edge opposite that corner
    for f in range(F.shape[0]):
        for c in range(3):
            e = EMAP[f, c]
            verts = {F[f, (c + 1) % 3], F[f, (c + 2) % 3]}
            assert set(E[e]) == verts
    # interior edge (0,2) must have two incident faces
    diag = [i for i in range(E.shape[0]) if set(E[i]) == {0, 2}][0]
    assert set(EF[diag]) == {0, 1}
    # EF/EI cross-consistency
    for e in range(E.shape[0]):
        for s in range(2):
            f, c = EF[e, s], EI[e, s]
            if f >= 0:
                assert EMAP[f, c] == e


def test_edge_manifold():
    V, F = square_mesh()
    assert is_edge_manifold(F)
    # three faces sharing one edge -> not manifold
    F_bad = np.array([[0, 1, 2], [0, 1, 3], [1, 0, 2]], dtype=np.int64)
    assert not is_edge_manifold(F_bad)


def test_boundary_facets_square():
    V, F = square_mesh()
    bf = boundary_facets(F)
    assert bf.shape[0] == 4
    undirected = {frozenset(e) for e in bf.tolist()}
    assert undirected == {
        frozenset({0, 1}),
        frozenset({1, 2}),
        frozenset({2, 3}),
        frozenset({0, 3}),
    }


def test_boundary_facets_closed():
    V, F = icosphere(1)
    assert boundary_facets(F).shape[0] == 0


def test_connect_boundary_to_infinity():
    V, F = square_mesh()
    V2, F2, inf_vid = connect_boundary_to_infinity(V, F)
    assert inf_vid == 4
    assert F2.shape[0] == F.shape[0] + 4
    assert boundary_facets(F2).shape[0] == 0
    assert is_edge_manifold(F2)


def test_remove_unreferenced():
    V = np.random.default_rng(0).normal(size=(6, 3))
    F = np.array([[0, 2, 4], [2, 4, 5]], dtype=np.int64)
    V2, F2, IM, J = remove_unreferenced(V, F)
    assert V2.shape[0] == 4
    np.testing.assert_allclose(V2[F2], V[F])


def test_normalize_unit_area():
    V, F = icosphere(2)
    V2 = normalize_unit_area(3.0 * V + 1.0, F)
    assert abs(doublearea(V2, F).sum() / 2.0 - 1.0) < 1e-12
    assert abs(V2[:, 0].mean()) < 1e-12
    assert abs(V2[:, 1].mean()) < 1e-12
    assert abs(V2[:, 2].min()) < 1e-12


def test_internal_angles_sum():
    V, F = icosphere(1)
    ang = internal_angles(V, F)
    np.testing.assert_allclose(ang.sum(axis=1), np.pi, atol=1e-12)


def test_triangle_quality_equilateral():
    V = np.array([[0, 0, 0], [1, 0, 0], [0.5, np.sqrt(3) / 2, 0]])
    F = np.array([[0, 1, 2]])
    np.testing.assert_allclose(triangle_quality(V, F), 1.0, atol=1e-12)
    # degenerate
    V2 = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0]])
    assert triangle_quality(V2, F)[0] < 1e-12


def test_obj_roundtrip(tmp_path):
    V, F = icosphere(1)
    p = str(tmp_path / "m.obj")
    write_obj(p, V, F)
    V2, F2 = read_obj(p)
    np.testing.assert_allclose(V, V2, atol=1e-15)
    np.testing.assert_array_equal(F, F2)


def test_compute_barycentric():
    UV = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    F = np.array([[0, 1, 2], [1, 3, 2]])
    p = np.array([0.25, 0.25])
    B = compute_barycentric(p, UV, F)
    # reconstruct p from each row
    for fi in range(2):
        rec = B[fi] @ UV[F[fi]]
        np.testing.assert_allclose(rec, p, atol=1e-14)
    # p inside face 0: nonneg baries there
    assert B[0].min() >= -1e-14
    fi, row = snap_to_best_face(B)
    assert fi == 0
    np.testing.assert_allclose(row.sum(), 1.0)


def test_read_bundled_mesh():
    from surface_multigrid_code_tpu.utils.paths import mesh_path

    V, F = read_obj(mesh_path("bunny"))
    assert V.shape == (9353, 3)
    assert F.shape == (18555, 3)
    assert is_edge_manifold(F)


def test_boundary_loops_pinched_raises():
    # two triangles sharing only vertex 0: the boundary pinches there, so
    # vertex 0 has two outgoing boundary edges -> must raise, not hang
    from surface_multigrid_code_tpu.utils.mesh import boundary_loops

    F = np.array([[0, 1, 2], [0, 3, 4]])
    with pytest.raises(ValueError, match="non-manifold boundary"):
        boundary_loops(F)


def test_boundary_loops_two_loops():
    # open cylinder: two boundary loops, both returned, longest first
    from surface_multigrid_code_tpu.utils.mesh import boundary_loops

    n = 8
    faces = []
    for i in range(n):
        a, b = i, (i + 1) % n
        faces += [[a, b, b + n], [a, b + n, a + n]]
    loops = boundary_loops(np.array(faces))
    assert len(loops) == 2
    assert sorted(len(l) for l in loops) == [n, n]
    assert {int(v) for v in np.concatenate(loops)} == set(range(2 * n))
