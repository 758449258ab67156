"""Bending energy (midedge-average SFF): rest-state zero, FD gradients,
curvature response, Hessian assembly consistency."""

import numpy as np
import pytest

from surface_multigrid_code_tpu.models.shell import (
    ShellEnergy,
    lame_parameters,
    opposite_vertices,
)
from surface_multigrid_code_tpu.utils.synthetic import icosphere


@pytest.fixture(scope="module")
def sphere():
    return icosphere(2)


@pytest.mark.parametrize("material", ["stvk", "neohookean"])
def test_bending_rest_zero_and_fd(sphere, material):
    V, F = sphere
    alpha, beta = lame_parameters(1e2, 0.3)
    sh = ShellEnergy(V, F, 0.1, alpha, beta, material, bending=True)
    x = V.reshape(-1)
    assert abs(sh.energy(x)) < 1e-8
    assert np.abs(sh.gradient(x)).max() < 1e-6
    rng = np.random.default_rng(0)
    xq = (V * 1.03 + 0.01 * rng.normal(size=V.shape)).reshape(-1)
    g = sh.gradient(xq)
    eps = 1e-6
    for i in rng.choice(x.size, 8, replace=False):
        xp = xq.copy()
        xp[i] += eps
        xm = xq.copy()
        xm[i] -= eps
        fd = (sh.energy(xp) - sh.energy(xm)) / (2 * eps)
        assert abs(fd - g[i]) < 1e-4 * max(1.0, abs(fd)), (i, fd, g[i])


def test_bending_penalizes_curvature_change(sphere):
    """Scaling a sphere changes curvature but not angles -> with bending the
    energy of a scaled sphere exceeds the pure-stretching energy ratio."""
    V, F = sphere
    alpha, beta = lame_parameters(1e2, 0.3)
    s = ShellEnergy(V, F, 0.1, alpha, beta, "stvk", bending=False)
    sb = ShellEnergy(V, F, 0.1, alpha, beta, "stvk", bending=True)
    x = (1.3 * V).reshape(-1)
    e_s = s.energy(x)
    e_sb = sb.energy(x)
    assert e_sb > e_s > 0


def test_bending_hessian_matches_fd(sphere):
    V, F = sphere
    alpha, beta = lame_parameters(1e2, 0.3)
    sh = ShellEnergy(V, F, 0.1, alpha, beta, "stvk", bending=True)
    x = (V * 1.02).reshape(-1)
    K = sh.hessian(x)
    assert (abs(K - K.T) > 1e-8).nnz == 0
    rng = np.random.default_rng(1)
    eps = 1e-6
    for i in rng.choice(x.size, 4, replace=False):
        xp = x.copy()
        xp[i] += eps
        xm = x.copy()
        xm[i] -= eps
        fd = (sh.gradient(xp) - sh.gradient(xm)) / (2 * eps)
        col = np.asarray(K[:, i].todense()).ravel()
        assert np.abs(fd - col).max() < 1e-3 * max(1.0, np.abs(col).max())


def test_opposite_vertices_topology(sphere):
    V, F = sphere
    opp, mask = opposite_vertices(F)
    # closed mesh: every edge has a neighbor
    assert mask.min() == 1.0
    # the opposite vertex is never one of the face's own vertices
    for f in range(F.shape[0]):
        assert not set(opp[f]).intersection(set(F[f]))
