"""Angle-based SFF formulations vs the midedge-average formulation.

All three SFF discretizations approximate the same second fundamental
form; on a smooth surface (sphere, b = a for unit radius up to sign
convention) they must agree closely at rest with zero edge DOFs."""

import numpy as np

import jax
import jax.numpy as jnp

from surface_multigrid_code_tpu.models.shell import (
    edge_tables,
    edge_thetas_jax,
    first_fundamental_forms,
    opposite_vertices,
    second_fundamental_form,
    second_fundamental_form_angle,
)
from surface_multigrid_code_tpu.utils.synthetic import icosphere


def all_sffs(V, F):
    Vj = jnp.asarray(V)
    Fj = jnp.asarray(F)
    opp, mask = opposite_vertices(F)
    x18 = jnp.concatenate(
        [Vj[Fj].reshape(-1, 9), Vj[jnp.asarray(opp)].reshape(-1, 9)], axis=1
    )
    b_avg = jax.vmap(second_fundamental_form)(x18, jnp.asarray(mask))
    eid, orient, ev = edge_tables(F)
    thetas = edge_thetas_jax(Vj, jnp.asarray(ev))
    th3 = thetas[jnp.asarray(eid)]
    phi3 = jnp.zeros_like(th3)
    x9 = Vj[Fj].reshape(-1, 9)
    b_tan = jax.vmap(
        lambda x, t, p, o: second_fundamental_form_angle(x, t, p, o, "tan")
    )(x9, th3, phi3, jnp.asarray(orient))
    b_sin = jax.vmap(
        lambda x, t, p, o: second_fundamental_form_angle(x, t, p, o, "sin")
    )(x9, th3, phi3, jnp.asarray(orient))
    return np.asarray(b_avg), np.asarray(b_tan), np.asarray(b_sin)


def test_sff_formulations_agree_on_sphere():
    V, F = icosphere(3)
    b_avg, b_tan, b_sin = all_sffs(V, F)
    # second fundamental form of the unit sphere equals the metric a (up to
    # the discretization's sign convention); compare formulations pairwise
    scale = np.abs(b_avg).mean()
    assert np.abs(b_tan - b_sin).mean() < 0.02 * scale
    assert np.abs(np.abs(b_tan) - np.abs(b_avg)).mean() < 0.2 * scale
    # mean curvature estimate: tr(a^-1 b) ~ +-2/R on a unit sphere
    a = np.asarray(first_fundamental_forms(jnp.asarray(V), jnp.asarray(F)))
    H = np.einsum("mij,mji->m", np.linalg.inv(a), b_tan)
    assert abs(np.abs(H).mean() - 2.0) < 0.1


def test_edge_theta_flat_is_zero():
    # planar patch: all dihedral angles vanish
    xs, ys = np.meshgrid(np.arange(4.0), np.arange(4.0))
    V = np.stack([xs.ravel(), ys.ravel(), np.zeros(16)], 1)
    faces = []
    for i in range(3):
        for j in range(3):
            a = i * 4 + j
            faces += [[a, a + 1, a + 5], [a, a + 5, a + 4]]
    F = np.array(faces)
    eid, orient, ev = edge_tables(F)
    thetas = np.asarray(edge_thetas_jax(jnp.asarray(V), jnp.asarray(ev)))
    assert np.abs(thetas).max() < 1e-12
