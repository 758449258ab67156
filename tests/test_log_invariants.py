"""Structural invariants of the SSP collapse log — the contract between
the native engine and every consumer (P assembly, queries, serialization).

Checks, per collapse record (reference semantics in parentheses):
  - b0 < b1 and both index the sorted patch vertex list
    (src/SSP_collapse_edge.cpp:117 asserts b(0) < b(1));
  - post faces are the subset of pre faces not containing both endpoints,
    with b1 rewritten to b0 (src/get_post_faces.cpp:13-36);
  - all UV triangles are positively oriented with quality >= the reference
    gates (check_valid_UV_lscm, src/joint_lscm.cpp:284,420);
  - decIM lists are ascending and cover exactly the pre-patch faces.
"""

import numpy as np
import pytest

from surface_multigrid_code_tpu.ssp.decimate import SSP_decimate
from surface_multigrid_code_tpu.utils.synthetic import icosphere


@pytest.fixture(scope="module")
def log():
    V, F = icosphere(3)
    ok, Vc, Fc, IMF, IM, log = SSP_decimate(V, F, 320, 0)
    assert ok
    return log


def signed_areas(uv, tri):
    a, b, c = uv[tri[:, 0]], uv[tri[:, 1]], uv[tri[:, 2]]
    return (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (
        b[:, 1] - a[:, 1]
    ) * (c[:, 0] - a[:, 0])


def tri_quality(uv, tri):
    a, b, c = uv[tri[:, 0]], uv[tri[:, 1]], uv[tri[:, 2]]
    l0 = np.linalg.norm(a - b, axis=1)
    l1 = np.linalg.norm(b - c, axis=1)
    l2 = np.linalg.norm(c - a, axis=1)
    s = (l0 + l1 + l2) / 2
    delta = np.sqrt(np.maximum(s * (s - l0) * (s - l1) * (s - l2), 0))
    return 4 * np.sqrt(3.0) * delta / (l0**2 + l1**2 + l2**2)


def test_collapse_records_invariants(log):
    n = log["voff"].shape[0] - 1
    for k in range(n):
        vlo, vhi = log["voff"][k], log["voff"][k + 1]
        subset = log["subset"][vlo:vhi]
        assert np.all(np.diff(subset) > 0)  # sorted unique
        b0, b1 = log["b"][k]
        assert 0 <= b0 < b1 < subset.shape[0]
        plo, phi = log["foff_pre"][k], log["foff_pre"][k + 1]
        qlo, qhi = log["foff_post"][k], log["foff_post"][k + 1]
        Fp = log["fuv_pre"][plo:phi]
        Fq = log["fuv_post"][qlo:qhi]
        assert phi - plo >= 3  # patches with <= 2 faces are rejected
        # post = pre minus faces containing both endpoints, b1 -> b0
        keep = ~(np.isin(Fp, [b0]).any(1) & np.isin(Fp, [b1]).any(1))
        expect = Fp[keep].copy()
        expect[expect == b1] = b0
        np.testing.assert_array_equal(Fq, expect)
        # global face ids consistent
        np.testing.assert_array_equal(
            log["fidx_post"][qlo:qhi], log["fidx_pre"][plo:phi][keep]
        )
        # UV validity gates hold in the stored log
        uv_pre = log["uv_pre"][vlo:vhi]
        uv_post = log["uv_post"][vlo:vhi]
        assert signed_areas(uv_pre, Fp).min() >= 1e-10
        assert signed_areas(uv_post, Fq).min() >= 1e-10
        assert tri_quality(uv_pre, Fp).min() >= 0.01
        assert tri_quality(uv_post, Fq).min() >= 0.01


def test_decim_index_consistency(log):
    n = log["voff"].shape[0] - 1
    # invert: face -> list of collapses, rebuilt from fidx_pre
    nF = log["dim_off"].shape[0] - 1
    rebuilt = [[] for _ in range(nF)]
    for k in range(n):
        plo, phi = log["foff_pre"][k], log["foff_pre"][k + 1]
        for f in log["fidx_pre"][plo:phi]:
            rebuilt[f].append(k)
    for f in range(nF):
        lo, hi = log["dim_off"][f], log["dim_off"][f + 1]
        lst = log["dim_dat"][lo:hi]
        assert np.all(np.diff(lst) > 0)  # strictly ascending
        np.testing.assert_array_equal(lst, np.asarray(rebuilt[f]))
