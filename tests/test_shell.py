"""Shell energy tests: autodiff gradients/Hessians vs finite differences,
rest-state properties, and a small balloon step driving the block
multigrid solver end-to-end (reference example 06 semantics)."""

import numpy as np
import pytest

from surface_multigrid_code_tpu.models.balloon import (
    implicit_euler_mg_balloon,
    lumped_mass_matrix,
    run_balloon,
    vertex_normals,
)
from surface_multigrid_code_tpu.models.shell import (
    MATERIALS,
    ShellEnergy,
    lame_parameters,
)
from surface_multigrid_code_tpu.utils.synthetic import icosphere


@pytest.fixture(scope="module")
def sphere():
    return icosphere(2)


@pytest.mark.parametrize("material", MATERIALS)
def test_rest_state_zero_energy(sphere, material):
    V, F = sphere
    alpha, beta = lame_parameters(6e6, 0.5)
    sh = ShellEnergy(V, F, 0.1, alpha, beta, material)
    x = V.reshape(-1)
    assert abs(sh.energy(x)) < 1e-8
    assert np.abs(sh.gradient(x)).max() < 1e-6


@pytest.mark.parametrize("material", ["neohookean", "stvk"])
def test_gradient_matches_fd(sphere, material):
    V, F = sphere
    alpha, beta = lame_parameters(1e2, 0.3)
    sh = ShellEnergy(V, F, 0.1, alpha, beta, material)
    rng = np.random.default_rng(0)
    x = (V * 1.05 + 0.01 * rng.normal(size=V.shape)).reshape(-1)
    g = sh.gradient(x)
    eps = 1e-6
    for i in rng.choice(x.size, 10, replace=False):
        xp = x.copy()
        xp[i] += eps
        xm = x.copy()
        xm[i] -= eps
        fd = (sh.energy(xp) - sh.energy(xm)) / (2 * eps)
        assert abs(fd - g[i]) < 1e-4 * max(1.0, abs(fd)), (i, fd, g[i])


def test_hessian_matches_fd_gradient(sphere):
    V, F = sphere
    alpha, beta = lame_parameters(1e2, 0.3)
    sh = ShellEnergy(V, F, 0.1, alpha, beta, "neohookean")
    rng = np.random.default_rng(1)
    x = (V * 1.02).reshape(-1)
    K = sh.hessian(x)
    assert (abs(K - K.T) > 1e-8).nnz == 0  # symmetric
    eps = 1e-6
    for i in rng.choice(x.size, 5, replace=False):
        xp = x.copy()
        xp[i] += eps
        xm = x.copy()
        xm[i] -= eps
        fd = (sh.gradient(xp) - sh.gradient(xm)) / (2 * eps)
        col = np.asarray(K[:, i].todense()).ravel()
        assert np.abs(fd - col).max() < 1e-3 * max(1.0, np.abs(col).max())


def test_balloon_inflates(sphere):
    V, F = sphere
    steps = list(
        run_balloon(V, F, n_steps=2, young=6e4, pressure=1e3, verbose=False)
    )
    assert len(steps) == 2
    # inflation pushes outward: mean radius grows, no NaNs
    r0 = np.linalg.norm(V, axis=1).mean()
    r2 = np.linalg.norm(steps[-1], axis=1).mean()
    assert np.isfinite(steps[-1]).all()
    assert r2 > r0


def test_vertex_normals_outward(sphere):
    V, F = sphere
    N = vertex_normals(V, F)
    # on a sphere, normals align with positions
    cos = (N * V).sum(1) / np.linalg.norm(V, axis=1)
    assert cos.min() > 0.9


def test_run_balloon_bsr_matches_scalar(sphere):
    # the default (BSR) driver path and the reference-layout scalar path
    # must agree: same Newton schedule, same tolerances, different layout
    V, F = sphere
    kw = dict(n_steps=1, young=6e4, pressure=1e3, mg_tolerance=1e-8,
              n_newton=3, verbose=False)
    (p_bsr,) = run_balloon(V, F, solver="bsr", **kw)
    (p_sca,) = run_balloon(V, F, solver="scalar", **kw)
    scale = max(1.0, np.abs(p_sca - V).max())
    assert np.abs(p_bsr - p_sca).max() < 1e-6 * scale


@pytest.mark.parametrize("material", ["neohookean", "stvk", "tension_field"])
def test_structured_hessian_matches_autodiff(material):
    # face_hessian_stretch (metric pullback: J' H_W J + sum g_k K_k) must
    # equal jax.hessian of the same face energy to f64 roundoff
    import jax
    import jax.numpy as jnp

    from surface_multigrid_code_tpu.models.shell import (
        face_energy, face_hessian_stretch, first_fundamental_form)

    rng = np.random.default_rng(3)
    th, al, be = 1e-1, 2e5, 1e5
    for _ in range(5):
        x_rest = rng.standard_normal(9)
        # non-degenerate rest triangle
        x_rest[3:6] += np.array([1.0, 0, 0])
        x_rest[6:9] += np.array([0, 1.0, 0])
        abar = first_fundamental_form(jnp.asarray(x_rest))
        x9 = jnp.asarray(x_rest + 0.1 * rng.standard_normal(9))

        def fe(x):
            return face_energy(x, abar, th, al, be, material)

        H_ad = np.asarray(jax.hessian(fe)(x9))
        H_st = np.asarray(
            face_hessian_stretch(x9, abar, th, al, be, material)
        )
        scale = max(np.abs(H_ad).max(), 1.0)
        assert np.abs(H_ad - H_st).max() < 1e-9 * scale
