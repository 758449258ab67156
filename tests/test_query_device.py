"""Device (vmapped) query walks vs the native host walks."""

import numpy as np

from surface_multigrid_code_tpu.query.device import (
    pad_log,
    query_coarse_to_fine_device,
    query_fine_to_coarse_device,
)
from surface_multigrid_code_tpu.query.maps import (
    query_coarse_to_fine,
    query_fine_to_coarse,
)
from surface_multigrid_code_tpu.ssp.decimate import SSP_decimate
from surface_multigrid_code_tpu.utils.synthetic import icosphere


def corner_seeds(nV, F):
    BC = np.zeros((nV, 3))
    BF = np.zeros((nV, 3), dtype=np.int64)
    FIdx = np.zeros(nV, dtype=np.int64)
    seen = np.zeros(nV, bool)
    for fi, f in enumerate(F):
        for c, v in enumerate(f):
            if not seen[v]:
                seen[v] = True
                BC[v, c] = 1.0
                BF[v] = f
                FIdx[v] = fi
    return BC, BF, FIdx


def test_device_queries_match_host():
    V, F = icosphere(3)
    ok, Vc, Fc, IMF, IM, log = SSP_decimate(V, F, 320, 0)
    assert ok
    dlog = pad_log(log)

    # coarse -> fine: coarse vertices back onto the fine surface
    BC, BF, FIdx = corner_seeds(Vc.shape[0], Fc)
    h_bc, h_bf, h_fi = query_coarse_to_fine(log, BC, BF, FIdx)
    d_bc, d_bf, d_fi = query_coarse_to_fine_device(dlog, BC, BF, FIdx)
    pos_h = (h_bc[:, :, None] * V[h_bf]).sum(1)
    pos_d = (d_bc[:, :, None] * V[d_bf]).sum(1)
    # f32 walk may snap differently at exact ties; positions must agree
    err = np.linalg.norm(pos_h - pos_d, axis=1)
    assert np.median(err) < 1e-6
    assert (err < 1e-3).mean() > 0.99, err.max()

    # fine -> coarse: all fine vertices to the coarse mesh
    BC, BF, FIdx = corner_seeds(V.shape[0], F)
    h_bc, h_bf, h_fi = query_fine_to_coarse(log, BC, BF, FIdx)
    d_bc, d_bf, d_fi = query_fine_to_coarse_device(dlog, BC, BF, FIdx)
    pos_h = (h_bc[:, :, None] * Vc[h_bf]).sum(1)
    pos_d = (d_bc[:, :, None] * Vc[d_bf]).sum(1)
    err = np.linalg.norm(pos_h - pos_d, axis=1)
    assert np.median(err) < 1e-6
    assert (err < 1e-3).mean() > 0.99, err.max()


import pytest

from surface_multigrid_code_tpu.utils.obj_io import read_obj
from surface_multigrid_code_tpu.utils.paths import mesh_path


def _positions(bc, bf, Vtab):
    return (np.asarray(bc)[:, :, None] * Vtab[np.asarray(bf)]).sum(1)


def _rand_queries(F, n, seed=0):
    rng = np.random.default_rng(seed)
    fids = rng.integers(0, F.shape[0], n)
    return rng.dirichlet(np.ones(3), n), F[fids], fids


@pytest.mark.parametrize(
    "dec_type,seed", [(0, None), (1, None), (2, None), (1, 7), (0, 3)]
)
def test_roundtrip_f2c_c2f(dec_type, seed):
    # f2c then c2f must return (approximately) to the start point for all
    # decimation variants incl. qslim and the seeded random ones — the
    # SSP bijectivity property the paper's self-parameterization guarantees
    V, F = icosphere(3)
    ok, Vc, Fc, IMF, IM, log = SSP_decimate(V, F, 320, dec_type, seed=seed)
    assert ok
    bc, bf, fids = _rand_queries(F, 2000, seed=1)
    p0 = _positions(bc, bf, V)
    cbc, cbf, cfi = query_fine_to_coarse(log, bc, bf, fids)
    fbc, fbf, ffi = query_coarse_to_fine(log, cbc, cbf, cfi)
    p1 = _positions(fbc, fbf, V)
    # the walk is exact in the parameter domain; the 3D gap is the usual
    # decimation chord error, so compare against the mesh scale
    scale = np.linalg.norm(V.max(0) - V.min(0))
    err = np.linalg.norm(p0 - p1, axis=1) / scale
    assert np.median(err) < 5e-3, np.median(err)
    assert (err < 5e-2).mean() > 0.99

    dlog = pad_log(log)
    d_cbc, d_cbf, d_cfi = query_fine_to_coarse_device(dlog, bc, bf, fids)
    d_fbc, d_fbf, d_ffi = query_coarse_to_fine_device(dlog, d_cbc, d_cbf, d_cfi)
    p1d = _positions(d_fbc, d_fbf, V)
    errd = np.linalg.norm(p0 - p1d, axis=1) / scale
    assert np.median(errd) < 5e-3
    assert (errd < 5e-2).mean() > 0.99


def test_device_host_parity_boundary_mesh_10k():
    # boundary mesh (ogre), 10K+ random queries: device and host walks
    # must land on the same geometry
    V, F = read_obj(mesh_path("ogre"))
    ok, Vc, Fc, IMF, IM, log = SSP_decimate(V, F, 3000, 0)
    assert ok
    bc, bf, fids = _rand_queries(F, 12000, seed=2)
    h_bc, h_bf, h_fi = query_fine_to_coarse(log, bc, bf, fids)
    dlog = pad_log(log)
    d_bc, d_bf, d_fi = query_fine_to_coarse_device(dlog, bc, bf, fids)
    err = np.linalg.norm(
        _positions(h_bc, h_bf, Vc) - _positions(d_bc, d_bf, Vc), axis=1
    )
    assert np.median(err) < 1e-6
    assert (err < 1e-3).mean() > 0.999, err.max()


def test_query_on_two_boundary_loop_mesh():
    # regression companion to the manifold-gate fix: the whole decimate ->
    # query pipeline must work on a mesh with 2 boundary loops
    n, rows = 24, 12
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
    F = np.array(faces)
    ok, Vc, Fc, IMF, IM, log = SSP_decimate(V, F, 120, 1)
    assert ok
    bc, bf, fids = _rand_queries(F, 3000, seed=3)
    h_bc, h_bf, h_fi = query_fine_to_coarse(log, bc, bf, fids)
    dlog = pad_log(log)
    d_bc, d_bf, d_fi = query_fine_to_coarse_device(dlog, bc, bf, fids)
    err = np.linalg.norm(
        _positions(h_bc, h_bf, Vc) - _positions(d_bc, d_bf, Vc), axis=1
    )
    assert np.isfinite(np.asarray(h_bc)).all()
    assert np.median(err) < 1e-6
    assert (err < 1e-3).mean() > 0.99, err.max()
