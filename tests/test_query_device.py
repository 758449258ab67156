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
