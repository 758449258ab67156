"""Property tests for the native SSP decimation engine (SURVEY.md §4b).

The reference ships no tests; its quality control is runtime self-validation
inside the collapse kernel (src/joint_lscm.cpp:243-481) plus the example
programs.  Here we pin the engine's contracts: manifold preservation,
prolongation row-stochasticity (rows are convex barycentric weights with
<= 3 nnz, reference src/get_prolong.cpp:44-56), query-map consistency, and
the randomized variants' determinism under a fixed seed.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from surface_multigrid_code_tpu.config import DecimationType
from surface_multigrid_code_tpu.solver.hierarchy import (
    get_prolong,
    get_prolong_block,
    mg_precompute,
)
from surface_multigrid_code_tpu.ssp.decimate import SSP_decimate, save_log, load_log
from surface_multigrid_code_tpu.query.maps import (
    query_coarse_to_fine,
    query_fine_to_coarse,
)
from surface_multigrid_code_tpu.utils.synthetic import icosphere


def grid_mesh(n=12):
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    V = np.stack(
        [xs.ravel(), ys.ravel(), 0.1 * np.sin(xs.ravel()) * np.cos(ys.ravel())], 1
    ).astype(float)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces += [[a, a + 1, a + n + 1], [a, a + n + 1, a + n]]
    return V, np.array(faces)


def edges_of(F):
    E = set()
    for f in F:
        for a, b in ((f[0], f[1]), (f[1], f[2]), (f[2], f[0])):
            E.add((min(a, b), max(a, b)))
    return E


@pytest.mark.parametrize("dec_type", [0, 1, 2])
def test_decimate_closed_mesh(dec_type):
    V, F = icosphere(3)
    ok, Vc, Fc, IMF, IM, log = SSP_decimate(V, F, 320, dec_type)
    assert ok
    assert Fc.shape[0] <= 320
    # closed surface: Euler characteristic preserved
    assert Vc.shape[0] - len(edges_of(Fc)) + Fc.shape[0] == 2
    # birth maps are valid ids
    assert IM.max() < V.shape[0] and IMF.max() < F.shape[0]
    # vertex-removal placements are drawn from the input position set
    # (the surviving index may carry the other endpoint's position)
    if dec_type == DecimationType.VERTEX_REMOVAL:
        d = np.linalg.norm(Vc[:, None, :] - V[None, :, :], axis=2).min(axis=1)
        assert d.max() < 1e-12


@pytest.mark.parametrize("dec_type", [0, 1, 2])
def test_decimate_boundary_mesh(dec_type):
    V, F = grid_mesh()
    ok, Vc, Fc, IMF, IM, log = SSP_decimate(V, F, 80, dec_type)
    assert ok
    # disk topology preserved: V - E + F == 1
    assert Vc.shape[0] - len(edges_of(Fc)) + Fc.shape[0] == 1


def test_nonmanifold_rejected():
    # two triangles sharing an edge + a third fin on the same edge
    V = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1.0]])
    F = np.array([[0, 1, 2], [1, 0, 3], [0, 1, 4]])
    ok, *_ = SSP_decimate(V, F, 2, 1)
    assert not ok


@pytest.mark.parametrize("dec_type", [0, 1, 2])
def test_prolongation_rows_convex(dec_type):
    V, F = icosphere(3)
    Vc, Fc, P, J, IM, log = get_prolong(V, F, 320, dec_type)
    assert P.shape == (V.shape[0], Vc.shape[0])
    rows = np.asarray(P.sum(axis=1)).ravel()
    np.testing.assert_allclose(rows, 1.0, atol=1e-9)
    assert P.data.min() >= -1e-12
    assert np.diff(P.indptr).max() <= 3
    # coarse vertices that survive prolong to themselves: P @ Vc stays on the
    # patch, so distances to V are bounded by patch size
    err = np.abs(P @ Vc - V).max()
    assert err < 0.5


def test_prolongation_block():
    V, F = icosphere(2)
    Vc, Fc, P, J, IM, log = get_prolong(V, F, 80, 1)
    Vcb, Fcb, Pb, *_ = get_prolong_block(V, F, 80, 1)
    x = np.random.default_rng(0).normal(size=(Vc.shape[0], 3))
    y = P @ x
    yb = (Pb @ x.reshape(-1)).reshape(-1, 3)
    np.testing.assert_allclose(y, yb)


def test_random_variant_seeded():
    V, F = icosphere(3)
    _, _, _, _, IM1, _ = SSP_decimate(V, F, 320, 0, seed=42)
    _, _, _, _, IM2, _ = SSP_decimate(V, F, 320, 0, seed=42)
    _, _, _, _, IM3, _ = SSP_decimate(V, F, 320, 0, seed=7)
    assert np.array_equal(IM1, IM2)
    assert not np.array_equal(IM1, IM3)  # overwhelmingly likely


def test_query_coarse_to_fine_on_surface():
    V, F = icosphere(3)  # unit sphere
    ok, Vc, Fc, IMF, IM, log = SSP_decimate(V, F, 320, 0)
    n = Vc.shape[0]
    BC = np.zeros((n, 3))
    BF = np.zeros((n, 3), dtype=np.int64)
    FIdx = np.zeros(n, dtype=np.int64)
    seen = np.zeros(n, bool)
    for fi, f in enumerate(Fc):
        for c, v in enumerate(f):
            if not seen[v]:
                seen[v] = True
                BC[v, c] = 1
                BF[v] = f
                FIdx[v] = fi
    BC2, BF2, FI2 = query_coarse_to_fine(log, BC, BF, FIdx)
    np.testing.assert_allclose(BC2.sum(1), 1.0, atol=1e-9)
    assert BC2.min() >= 0
    assert FI2.max() < F.shape[0]
    pts = (BC2[:, :, None] * V[BF2]).sum(1)
    r = np.linalg.norm(pts, axis=1)
    # points live on the fine sphere (chordal sag of ico level 3 is < 1%)
    assert r.min() > 0.98 and r.max() < 1.01


def test_query_fine_to_coarse_consistent_with_P():
    """get_prolong assembles P from query_fine_to_coarse of corner seeds
    (reference src/get_prolong.cpp:23-56) — re-run the query and compare."""
    V, F = icosphere(3)
    Vc, Fc, P, J, IM, log = get_prolong(V, F, 320, 1)
    n = V.shape[0]
    BC = np.zeros((n, 3))
    BF = np.zeros((n, 3), dtype=np.int64)
    FIdx = np.zeros(n, dtype=np.int64)
    seen = np.zeros(n, bool)
    for fi, f in enumerate(F):
        for c, v in enumerate(f):
            if not seen[v]:
                seen[v] = True
                BC[v, c] = 1
                BF[v] = f
                FIdx[v] = fi
    BC2, BF2, FI2 = query_fine_to_coarse(log, BC, BF, FIdx)
    rows = np.repeat(np.arange(n), 3)
    P2 = sp.coo_matrix(
        (BC2.ravel(), (rows, BF2.ravel())), shape=(n, Vc.shape[0])
    ).tocsr()
    assert abs(P - P2).max() < 1e-12


def test_log_roundtrip(tmp_path):
    V, F = icosphere(2)
    ok, Vc, Fc, IMF, IM, log = SSP_decimate(V, F, 80, 1)
    save_log(tmp_path / "log.npz", log)
    log2 = load_log(tmp_path / "log.npz")
    for k in log:
        np.testing.assert_array_equal(log[k], log2[k])


def test_mg_precompute_levels():
    V, F = icosphere(4)  # 2562 verts
    mg = mg_precompute(V, F, ratio=0.25, min_coarsest_nv=100, verbose=False)
    # level count rule (reference src/mg_precompute.cpp:27-40)
    assert len(mg) == 3
    for lv in range(1, len(mg)):
        P = mg[lv].P_full
        assert P.shape == (mg[lv - 1].V.shape[0], mg[lv].V.shape[0])
        np.testing.assert_allclose(
            np.asarray(P.sum(axis=1)).ravel(), 1.0, atol=1e-9
        )


def torus_mesh(R=2.0, r=0.8, nu=24, nv=16):
    us = np.arange(nu) * 2 * np.pi / nu
    vs = np.arange(nv) * 2 * np.pi / nv
    V = []
    for u in us:
        for v in vs:
            V.append([
                (R + r * np.cos(v)) * np.cos(u),
                (R + r * np.cos(v)) * np.sin(u),
                r * np.sin(v),
            ])
    F = []
    for i in range(nu):
        for j in range(nv):
            a = i * nv + j
            b = ((i + 1) % nu) * nv + j
            c = i * nv + (j + 1) % nv
            d = ((i + 1) % nu) * nv + (j + 1) % nv
            F += [[a, b, d], [a, d, c]]
    return np.asarray(V), np.asarray(F)


@pytest.mark.parametrize("dec_type", [0, 1])
def test_decimate_torus_preserves_genus(dec_type):
    V, F = torus_mesh()
    ok, Vc, Fc, IMF, IM, log = SSP_decimate(V, F, 200, dec_type)
    assert ok
    # genus-1: V - E + F == 0
    assert Vc.shape[0] - len(edges_of(Fc)) + Fc.shape[0] == 0
    Vc2, Fc2, P, *_ = get_prolong(V, F, 200, dec_type)
    np.testing.assert_allclose(
        np.asarray(P.sum(axis=1)).ravel(), 1.0, atol=1e-9
    )


def test_mg_precompute_reuses_seeded_level0():
    """Caller-seeded mg[0] is reused (reference src/mg_precompute.cpp:43-49)."""
    from surface_multigrid_code_tpu.solver.hierarchy import MGLevel

    V, F = icosphere(3)
    V2 = V * 2.0  # distinct level-0 payload
    seeded = [MGLevel(V=V2, F=F)]
    mg = mg_precompute(V, F, min_coarsest_nv=100, mg=seeded, verbose=False)
    assert mg[0] is seeded[0]
    np.testing.assert_array_equal(mg[0].V, V2)


def cylinder_mesh(n=24, rows=12):
    """Open cylinder: two boundary loops (regression for the vertex-manifold
    gate, which must run on the PRE-closure mesh like the reference's
    src/SSP_decimate.cpp:20 — after infinity closure the single virtual
    vertex legitimately has one disconnected fan per loop)."""
    th = 2 * np.pi * np.arange(n) / n
    ring = np.stack([np.cos(th), np.sin(th)], 1)
    V = np.concatenate(
        [np.concatenate([ring, np.full((n, 1), z / (rows - 1.0))], 1)
         for z in range(rows)]
    )
    faces = []
    for r in range(rows - 1):
        for i in range(n):
            a = r * n + i
            b = r * n + (i + 1) % n
            faces += [[a, b, b + n], [a, b + n, a + n]]
    return V, np.array(faces)


@pytest.mark.parametrize("dec_type", [0, 1, 2])
def test_decimate_two_boundary_loops(dec_type):
    V, F = cylinder_mesh()
    ok, Vc, Fc, IMF, IM, log = SSP_decimate(V, F, 200, dec_type)
    assert ok, "manifold open cylinder must be accepted (ADVICE r1 medium)"
    assert Fc.shape[0] <= 200
    # genus-0 surface with 2 boundary loops: chi = 2 - 2g - b = 0
    assert Vc.shape[0] - len(edges_of(Fc)) + Fc.shape[0] == 0


def test_decimate_pinched_vertex_rejected():
    # two tetrahedra sharing exactly one vertex: edge-manifold everywhere
    # but vertex 0's fan is disconnected -> reference gate rejects
    tetV = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], float)
    tetF = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]])
    # second tet reuses vertex 0 and adds vertices 4,5,6
    m = np.array([0, 4, 5, 6])
    V = np.concatenate([tetV, tetV[1:] + np.array([2.0, 0, 0])])
    F = np.concatenate([tetF, m[tetF]])
    ok, *_ = SSP_decimate(V, F, 6, 1)
    assert not ok
