"""Golden regression: subdivision remeshing vs the reference's committed
output artifacts (the ONLY golden files the reference ships, SURVEY.md §4).

The reference commits output_s{0,1,2}.obj from example 08 (bunny, tarF 500,
midpoint, 2 subdivisions).  The greedy collapse sequences differ in
tie-breaking details, so vertices are not bit-identical — but both outputs
must be semi-regular remeshes ON the bunny surface with the same vertex
budget and the same surface-distance statistics.
"""

import pathlib

import numpy as np
import pytest

REFERENCE = pathlib.Path("/root/reference")
GOLDEN = pathlib.Path(__file__).resolve().parent.parent / "data" / "golden"


def _remesh(dec_type, seed, tarF=500, nsub=2):
    from surface_multigrid_code_tpu.query.maps import query_coarse_to_fine
    from surface_multigrid_code_tpu.ssp.decimate import SSP_decimate
    from surface_multigrid_code_tpu.utils.obj_io import read_obj
    from surface_multigrid_code_tpu.utils.paths import mesh_path
    from surface_multigrid_code_tpu.utils.upsample import upsample_barycentric

    VO, FO = read_obj(mesh_path("bunny"))
    ok, V, F, IMF, IM, log = SSP_decimate(VO, FO, tarF, dec_type, seed=seed)
    assert ok
    BC, BF, FIdx, faces = upsample_barycentric(V, F, nsub)
    BC, BF, FIdx = query_coarse_to_fine(log, BC, BF, FIdx)
    SV = (BC[:, :, None] * VO[BF]).sum(axis=1)
    return SV, faces


@pytest.mark.parametrize(
    "tag,dec_type,seed",
    [("ex08", 1, None), ("ex09", 0, 10)],
)
def test_golden_remesh_regenerate(tag, dec_type, seed):
    """Our own committed golden artifacts (data/golden/, the analog of the
    reference's committed 08_subdiv_remesh/output_s{0,1,2}.obj): regenerate
    the ex08/ex09 subdivision remeshes and compare — exact on connectivity,
    tolerance on vertices (the pipeline is deterministic double-precision
    host code; the tolerance only absorbs FP reassociation)."""
    from surface_multigrid_code_tpu.utils.obj_io import read_obj

    SV, faces = _remesh(dec_type, seed)
    for it, Fk in enumerate(faces):
        Vg, Fg = read_obj(str(GOLDEN / f"{tag}_output_s{it}.obj"))
        Vr = SV[: Fk.max() + 1]
        assert Fg.shape == Fk.shape and np.array_equal(Fg, Fk), (
            f"{tag} s{it}: connectivity changed"
        )
        assert Vg.shape == Vr.shape
        scale = np.abs(Vg).max()
        assert np.allclose(Vr, Vg, atol=1e-5 * scale), (
            f"{tag} s{it}: vertices drifted, max err "
            f"{np.abs(Vr - Vg).max():.3e}"
        )


def nearest_dist(P, V):
    from scipy.spatial import cKDTree

    return cKDTree(V).query(P)[0]


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_subdiv_remesh_matches_reference_statistics(tmp_path):
    from surface_multigrid_code_tpu.query.maps import query_coarse_to_fine
    from surface_multigrid_code_tpu.ssp.decimate import SSP_decimate
    from surface_multigrid_code_tpu.utils.obj_io import read_obj
    from surface_multigrid_code_tpu.utils.paths import mesh_path
    from surface_multigrid_code_tpu.utils.upsample import upsample_barycentric

    VO, FO = read_obj(mesh_path("bunny"))
    ok, V, F, IMF, IM, log = SSP_decimate(VO, FO, 500, 1)
    assert ok
    BC, BF, FIdx, faces = upsample_barycentric(V, F, 2)
    BC, BF, FIdx = query_coarse_to_fine(log, BC, BF, FIdx)
    SV = (BC[:, :, None] * VO[BF]).sum(axis=1)

    ref, _ = read_obj(str(REFERENCE / "08_subdiv_remesh" / "output_s2.obj"))
    # identical vertex budget (same decimation target + subdivision rule)
    assert SV.shape[0] == ref.shape[0]
    edge = np.linalg.norm(VO[FO[:, 0]] - VO[FO[:, 1]], axis=1).mean()
    d_ours = nearest_dist(SV, VO) / edge
    d_ref = nearest_dist(ref, VO) / edge
    # same surface-distance distribution (both sample the bunny surface)
    assert abs(d_ours.mean() - d_ref.mean()) < 0.05
    assert d_ours.max() < d_ref.max() + 0.25
    # and our points are genuinely on the surface
    assert d_ours.max() < 1.0
