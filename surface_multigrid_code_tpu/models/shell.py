"""Elastic shell stretching energies in JAX (balloon-sim application layer).

The reference vendors libshell with ~1.5 KLoC of hand-coded per-face
gradients/Hessians (06_example_balloon_sim/sim_utils/MaterialModel/*.cpp,
GeometryDerivatives.cpp).  TPU-first we instead write the per-face energy
densities once and get exact derivatives from JAX autodiff: the gradient is
one reverse-mode pass over all faces, and the per-face 9x9 Hessians come
from a vmapped forward-over-reverse `jax.hessian` — both batched,
MXU/VPU-friendly device code.

Energy densities (exactly the reference's formulas, stretching term only —
the balloon sim uses ET_STRETCHING alone, implicit_euler_mg_balloon.h:53):

- StVK (StVKMaterial.cpp:21-31):
    W = t/4 * dA * (alpha/2 tr(S)^2 + beta tr(S^2)),
    S = abar^-1 (a - abar),  dA = 1/2 sqrt(det abar)
- NeoHookean (NeoHookeanMaterial.cpp:21-34):
    W = t sqrt(det abar)/4 * (beta (tr(abar^-1 a) - 2 - 2 lnJ) + alpha lnJ^2),
    lnJ = 1/2 ln(det a / det abar)
- Tension-field StVK (TensionFieldStVKMaterial.cpp:21-110): StVK in pure
  tension; zero when fully slack (lambda1 < 0); relaxed single-wrinkle
  energy k dA lambda1^2 otherwise.

Lame parameters from Young's modulus / Poisson ratio as in the reference
(main.cpp:63-67): alpha = Y nu / (1 - nu^2), beta = Y / (2 (1 + nu)).
"""

from __future__ import annotations

import functools

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

MATERIALS = ("neohookean", "stvk", "tension_field")


def lame_parameters(young: float, poisson: float) -> tuple[float, float]:
    alpha = young * poisson / (1.0 - poisson * poisson)
    beta = young / 2.0 / (1.0 + poisson)
    return alpha, beta


def first_fundamental_form(x9: jnp.ndarray) -> jnp.ndarray:
    """2x2 metric of one triangle given its stacked vertex positions [9]."""
    v0, v1, v2 = x9[0:3], x9[3:6], x9[6:9]
    e1, e2 = v1 - v0, v2 - v0
    return jnp.array(
        [
            [jnp.dot(e1, e1), jnp.dot(e1, e2)],
            [jnp.dot(e1, e2), jnp.dot(e2, e2)],
        ]
    )


def first_fundamental_forms(V: jnp.ndarray, F: jnp.ndarray) -> jnp.ndarray:
    """Per-face rest metrics abar [m,2,2] (ElasticShell::firstFundamentalForms)."""
    x9 = V[F].reshape(F.shape[0], 9)
    return jax.vmap(first_fundamental_form)(x9)


def _det2(a):
    return a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]


def _inv2(a):
    d = _det2(a)
    return jnp.array([[a[1, 1], -a[0, 1]], [-a[1, 0], a[0, 0]]]) / d


def _stvk_W(S, alpha, beta):
    return 0.5 * alpha * jnp.trace(S) ** 2 + beta * jnp.trace(S @ S)


def face_energy(x9, abar, thickness, alpha, beta, material: str):
    """Stretching energy of one face (density formulas above)."""
    a = first_fundamental_form(x9)
    detabar = _det2(abar)
    abarinv = _inv2(abar)
    if material == "neohookean":
        deta = _det2(a)
        lnJ = 0.5 * jnp.log(deta / detabar)
        W = beta * (jnp.trace(abarinv @ a) - 2.0 - 2.0 * lnJ) + alpha * lnJ**2
        return thickness * jnp.sqrt(detabar) / 4.0 * W
    S = abarinv @ (a - abar)
    dA = 0.5 * jnp.sqrt(detabar)
    coeff = thickness / 4.0
    if material == "stvk":
        return coeff * dA * _stvk_W(S, alpha, beta)
    # tension-field StVK (branchless via jnp.where; the guarded sqrt keeps
    # autodiff NaN-free at branch boundaries)
    T = jnp.trace(S)
    D = _det2(S)
    disc = jnp.sqrt(jnp.maximum(T * T / 4.0 - D, 1e-30))
    lam1 = T / 2.0 + disc  # largest eigenvalue
    lam2 = T / 2.0 - disc
    k1 = 0.5 * coeff * alpha
    k2 = coeff * beta
    transition = -k1 / (k1 + k2)
    pure_tension = jnp.logical_and(lam1 >= 0, lam2 >= transition * lam1)
    slack = lam1 < 0
    # relaxed single-wrinkle energy: kstretching dA lambda1^2, with the
    # thickness/4 factor already inside k1/k2 (reference :103-106)
    kstretch = k1 + k2 - k1 * k1 / (k1 + k2)
    wrinkle = kstretch * dA * lam1 * lam1
    stvk = coeff * dA * _stvk_W(S, alpha, beta)
    return jnp.where(pure_tension, stvk, jnp.where(slack, 0.0, wrinkle))


def _energy_sum(x_flat, F, abars, thickness, alpha, beta, material):
    x9 = x_flat.reshape(-1, 3)[F].reshape(F.shape[0], 9)
    e = jax.vmap(
        lambda x, ab: face_energy(x, ab, thickness, alpha, beta, material)
    )(x9, abars)
    return e.sum()


class ShellEnergy:
    """Stretching energy + autodiff gradient / per-face Hessians.

    Equivalent of ElasticShell<SFF>::elasticEnergy(..., ET_STRETCHING)
    returning (energy, gradient, Hessian triplets); the Hessian is
    assembled as a scipy CSR over interleaved xyz DOFs for the block
    multigrid solver.
    """

    def __init__(self, V_rest, F, thickness, alpha, beta, material="neohookean"):
        assert material in MATERIALS
        self.F = np.asarray(F, dtype=np.int64)
        self.n = int(np.asarray(V_rest).shape[0])
        self.thickness = float(thickness)
        self.alpha = float(alpha)
        self.beta = float(beta)
        self.material = material
        Fj = jnp.asarray(self.F)
        self.abars = first_fundamental_forms(jnp.asarray(V_rest), Fj)

        fun = functools.partial(
            _energy_sum,
            F=Fj,
            abars=self.abars,
            thickness=self.thickness,
            alpha=self.alpha,
            beta=self.beta,
            material=self.material,
        )
        self._energy = jax.jit(fun)
        self._grad = jax.jit(jax.grad(fun))

        def face_e(x9, ab):
            return face_energy(
                x9, ab, self.thickness, self.alpha, self.beta, self.material
            )

        self._face_hess = jax.jit(jax.vmap(jax.hessian(face_e)))

        # static COO pattern for Hessian assembly: rows/cols of each face's
        # 9x9 block over interleaved DOFs
        dof = (3 * self.F[:, :, None] + np.arange(3)[None, None, :]).reshape(-1, 9)
        self._rows = np.repeat(dof, 9, axis=1).reshape(-1)
        self._cols = np.tile(dof, (1, 9)).reshape(-1)

    def energy(self, x_flat) -> float:
        return float(self._energy(jnp.asarray(x_flat)))

    def gradient(self, x_flat) -> np.ndarray:
        return np.asarray(self._grad(jnp.asarray(x_flat)), dtype=np.float64)

    def hessian(self, x_flat) -> sp.csr_matrix:
        x9 = np.asarray(x_flat, dtype=np.float64).reshape(-1, 3)[self.F].reshape(
            -1, 9
        )
        H = np.asarray(self._face_hess(jnp.asarray(x9), self.abars))
        K = sp.coo_matrix(
            (H.reshape(-1), (self._rows, self._cols)),
            shape=(3 * self.n, 3 * self.n),
        ).tocsr()
        return K
