"""Jitted Galerkin multigrid V-cycle on device.

Mirrors the reference recursion (src/mg_VCycle.cpp:3-59): pre-relax,
residual, restrict (PT @ r), recurse with zero initial guess, prolong and
add (P @ uc), post-relax; coarsest level solves additively with a
prefactorized dense factorization (the reference uses SimplicialLDLT with a
1e-12 diagonal shift, src/min_quad_with_fixed_mg.cpp:31-48 — we use dense
LU since the coarsest level is ~500x500 and LU tolerates the near-singular
unconstrained Laplacian case).

The recursion is unrolled in Python over a static tuple of levels, so XLA
sees one flat graph with static shapes per level — the idiomatic way to
handle per-level shape differences under jit.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from surface_multigrid_code_tpu.config import SolveConfig, SmootherType
from surface_multigrid_code_tpu.ops.sparse import ELLMatrix, ell_from_csr, ell_spmv
from surface_multigrid_code_tpu.ops.well import (
    B_ROWS,
    WellMatrix,
    any_spmv,
    build_well_auto,
    well_apply,
)
from surface_multigrid_code_tpu.ops.smoothers import (
    greedy_coloring,
    color_groups,
    group_scales,
    multicolor_gs_sweep,
    multicolor_gs_sweep_masked,
    jacobi_sweep,
    chebyshev_smooth,
)


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceLevel:
    """Per-level device data; P/PT map this level to the next-finer level
    (as in reference mg_data: mg[lv].P is n_{lv-1} x n_lv). None at level 0.
    lam_max estimates the largest eigenvalue of D^-1 A (Chebyshev smoothing).
    """

    A: ELLMatrix
    diag: jnp.ndarray
    P: ELLMatrix | None
    PT: ELLMatrix | None
    groups: tuple[jnp.ndarray, ...]
    group_scale: tuple[jnp.ndarray, ...]
    lam_max: jnp.ndarray | None = None
    # Per-color full-length 0/1 row masks (multicolor GS on the windowed
    # kernel: one full SpMV + mask per color instead of per-color row
    # gathers, which XLA:TPU serializes; see multicolor_gs_sweep_masked).
    group_mask: tuple = ()
    # Windowed-ELL (Pallas kernel) variants of A / P / PT; populated when
    # the hierarchy was built with well=True (RCM-class ordering applied).
    # When present, every SpMV in the V-cycle routes through the kernel.
    Aw: object | None = None
    Pw: object | None = None
    PTw: object | None = None

    def tree_flatten(self):
        children = (
            self.A, self.diag, self.P, self.PT, self.groups, self.group_scale,
            self.lam_max, self.Aw, self.Pw, self.PTw, self.group_mask,
        )
        return children, None

    @classmethod
    def tree_unflatten(cls, aux, children):
        (A, diag, P, PT, groups, group_scale, lam_max,
         Aw, Pw, PTw, group_mask) = children
        return cls(A, diag, P, PT, groups, group_scale, lam_max,
                   Aw=Aw, Pw=Pw, PTw=PTw, group_mask=group_mask)


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceHierarchy:
    levels: tuple[DeviceLevel, ...]
    coarse_inv: jnp.ndarray  # dense (pseudo-)inverse of the coarsest A

    def tree_flatten(self):
        return (self.levels, self.coarse_inv), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def n_levels(self) -> int:
        return len(self.levels)


def build_device_hierarchy(
    As: list[sp.spmatrix],
    Ps: list[sp.spmatrix],
    cfg: SolveConfig = SolveConfig(),
    dtype=None,
    colorings: list[np.ndarray] | None = None,
    well: bool = False,
) -> DeviceHierarchy:
    """Host -> device hierarchy build.  dtype defaults x64-aware (f64
    under jax_enable_x64, else f32 — an explicit f64 request under a
    non-x64 runtime would silently truncate with warning spam).

    As: per-level Galerkin matrices (len L), coarsest already diag-shifted.
    Ps: prolongations, Ps[l] maps level l+1 -> level l (len L-1).
    colorings: optional cached row colorings (sparsity is static across
    value refreshes, e.g. MCF's per-step rebuild).
    well: additionally pack each operator into windowed-ELL form for the
    Pallas SpMV kernel (ops/well.py). The caller must have applied a
    bandwidth-minimizing ordering (solver/ordering.py) to As/Ps first —
    windows (and kernel cost) are whatever the ordering achieves.
    """
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    L = len(As)
    levels = []
    for lv in range(L):
        A = As[lv].tocsr()
        diag = jnp.asarray(A.diagonal(), dtype=dtype)
        # well=True: the kernel layouts carry every SpMV, so the ELL
        # duplicates of A/P/PT would only be dead upload weight (~8B/slot
        # through the tunnel at 2.6M-vertex scale); keep ELL only at the
        # coarsest level (shape bookkeeping + it is tiny)
        ell = (
            ell_from_csr(A, dtype=dtype)
            if (not well or lv == L - 1)
            else None
        )
        group_mask = ()
        if cfg.smoother == SmootherType.MULTICOLOR_GS and lv < L - 1:
            color = (
                colorings[lv]
                if colorings is not None
                else greedy_coloring(A)
            )
            groups_np = color_groups(color)
            groups = tuple(jnp.asarray(g) for g in groups_np)
            group_scale = tuple(
                jnp.asarray(s, dtype=dtype) for s in group_scales(groups_np)
            )
            if well:
                masks = []
                for g in groups_np:
                    m = np.zeros(A.shape[0], dtype=bool)
                    m[g] = True
                    masks.append(jnp.asarray(m.astype(np.float64), dtype=dtype))
                group_mask = tuple(masks)
        else:
            groups = ()
            group_scale = ()
        if lv == 0 or well:
            P = PT = None
        else:
            P = ell_from_csr(Ps[lv - 1], dtype=dtype)
            PT = ell_from_csr(Ps[lv - 1].T.tocsr(), dtype=dtype)
        lam_max = None
        if cfg.smoother == SmootherType.CHEBYSHEV:
            lam_max = jnp.asarray(
                _power_iteration_lam_max(A), dtype=dtype
            )
        Aw = Pw = PTw = None
        if well:
            # cheapest windowed layout per operator: tap-recentered
            # rows or diagonal candidates (probe_tap_windows.py /
            # probe_dia_windows.py; A/B'd on TPU in probe_dia_ab.py)
            Aw = build_well_auto(A, dtype=dtype)
            if lv > 0:
                Pw = build_well_auto(Ps[lv - 1], dtype=dtype)
                PTw = build_well_auto(Ps[lv - 1].T.tocsr(), dtype=dtype)
        levels.append(
            DeviceLevel(
                A=ell, diag=diag, P=P, PT=PT, groups=groups,
                group_scale=group_scale, lam_max=lam_max,
                group_mask=group_mask, Aw=Aw, Pw=Pw, PTw=PTw,
            )
        )
    # Coarse solve: the reference prefactorizes with SimplicialLDLT after a
    # +1e-12 diagonal shift (src/min_quad_with_fixed_mg.cpp:31-48).  On TPU
    # we instead build a nullspace-deflated pseudo-inverse on host in f64 and
    # apply it as ONE dense matmul on device: triangular solves are serial
    # and slow on TPU while a ~500x500 matmul rides the MXU, and deflation
    # keeps f32 runs stable when the unconstrained Laplacian is singular
    # (the 1e-12 shift is below f32 epsilon, so an f32 LU would blow up).
    Ac = np.asarray(As[-1].todense(), dtype=np.float64)
    Ac = 0.5 * (Ac + Ac.T)
    w, U = np.linalg.eigh(Ac)
    cutoff = max(1e-10 * float(np.abs(w).max()), 1e-300)
    inv_w = np.where(np.abs(w) > cutoff, 1.0 / np.where(w == 0, 1.0, w), 0.0)
    Cinv = (U * inv_w) @ U.T
    return DeviceHierarchy(
        levels=tuple(levels), coarse_inv=jnp.asarray(Cinv, dtype=dtype)
    )


def _power_iteration_lam_max(A: sp.spmatrix, iters: int = 20) -> float:
    """Largest eigenvalue of D^-1 A via host power iteration (Chebyshev
    smoothing bound); 10% safety margin as is conventional."""
    dinv = 1.0 / A.diagonal()
    rng = np.random.default_rng(0)
    x = rng.normal(size=A.shape[0])
    lam = 1.0
    for _ in range(iters):
        x = dinv * (A @ x)
        lam = np.linalg.norm(x)
        x /= lam
    return 1.1 * float(lam)


def _relax(level: DeviceLevel, b, u, cfg: SolveConfig, n_iter: int):
    """n_iter relaxation steps (the reference's `relax` x N,
    src/mg_VCycle.cpp:36,57,113-178)."""
    Aop = level.Aw if level.Aw is not None else level.A
    if cfg.smoother == SmootherType.CHEBYSHEV and level.lam_max is not None:
        return chebyshev_smooth(
            Aop, level.diag, level.lam_max, b, u, degree=n_iter
        )
    for _ in range(n_iter):
        if cfg.smoother == SmootherType.MULTICOLOR_GS and level.groups:
            if level.Aw is not None and level.group_mask:
                u = multicolor_gs_sweep_masked(
                    level.Aw, level.diag, level.group_mask, b, u
                )
            else:
                u = multicolor_gs_sweep(
                    level.A, level.diag, level.groups, level.group_scale,
                    b, u,
                )
        else:
            u = jacobi_sweep(Aop, level.diag, b, u, weight=cfg.jacobi_weight)
    return u


def _pad_flat(v: jnp.ndarray, npad: int) -> jnp.ndarray:
    """Zero-tail pad a flat [n] vector to [npad] (identity when equal)."""
    if v.shape[0] == npad:
        return v
    out = jnp.zeros((npad,), dtype=v.dtype)
    return jax.lax.dynamic_update_slice(out, v, (0,))


def _pad_planes(v: jnp.ndarray, npad: int) -> jnp.ndarray:
    """Zero-tail pad planes [C, n] to [C, npad] (identity when equal)."""
    if v.shape[1] == npad:
        return v
    out = jnp.zeros((v.shape[0], npad), dtype=v.dtype)
    return jax.lax.dynamic_update_slice(out, v, (0, 0))


def _nb_of(level: DeviceLevel) -> int:
    W = level.Aw
    return (W[0] if isinstance(W, tuple) else W).nb


def _vcycle_tiled(
    hier: DeviceHierarchy, b: jnp.ndarray, u: jnp.ndarray, cfg: SolveConfig
) -> jnp.ndarray:
    """Padded-flow V-cycle for windowed (well=True) hierarchies.

    Every level vector lives zero-tail padded to nb_l*B_ROWS, so each
    smoother update / residual / restrict / prolong-add is ONE fused
    Pallas call per slot group (ops/well.well_apply epilogues) with no
    XLA elementwise ops or pad copies between kernels. Semantics are
    identical to the unfused path (same reference schedule,
    src/mg_VCycle.cpp:3-59) — padded rows carry zeros end to end.

    Multi-column RHS: b/u of shape [C, n] (PLANES layout, one row per RHS
    column) run every kernel batched — the select chain resolves once per
    window row and serves all C columns (ops/well.well_spmv_planes); the
    reference's multi-column instantiations are
    src/min_quad_with_fixed_mg.cpp:363-373.
    """
    L = hier.n_levels
    planes = b.ndim == 2
    pad = _pad_planes if planes else _pad_flat

    def relax(level: DeviceLevel, Bt, Ut, n_iter: int, dinv_t, sgs_t):
        if (
            cfg.smoother == SmootherType.CHEBYSHEV
            and level.lam_max is not None
        ):
            lam_max = level.lam_max
            lam_min = lam_max / 4.0
            theta = 0.5 * (lam_max + lam_min)
            delta = 0.5 * (lam_max - lam_min)
            r = well_apply(
                level.Aw, Ut, epi="resid_scaled", b=Bt, s=dinv_t,
                unpadded=False,
            )
            d = r / theta
            Ut = Ut + d
            sigma = theta / delta
            rho = 1.0 / sigma
            for _ in range(n_iter - 1):
                rho_new = 1.0 / (2.0 * sigma - rho)
                r = well_apply(
                    level.Aw, Ut, epi="resid_scaled", b=Bt, s=dinv_t,
                    unpadded=False,
                )
                d = rho_new * rho * d + (2.0 * rho_new / delta) * r
                Ut = Ut + d
                rho = rho_new
            return Ut
        for _ in range(n_iter):
            if cfg.smoother == SmootherType.MULTICOLOR_GS and sgs_t:
                for s_c in sgs_t:
                    Ut = well_apply(
                        level.Aw, Ut, epi="axpby", u=Ut, b=Bt, s=s_c,
                        unpadded=False,
                    )
            else:
                Ut = well_apply(
                    level.Aw, Ut, epi="axpby", u=Ut, b=Bt, s=dinv_t,
                    escale=cfg.jacobi_weight, unpadded=False,
                )
        return Ut

    def go(lv: int, Bt, Ut):
        level = hier.levels[lv]
        if lv == L - 1:
            nL = level.diag.shape[0]
            if planes:
                # one dense matmul per coarse solve (columns ride the MXU
                # together); the untransposed inverse is applied so a
                # nonsymmetric coarse_inv would still match the
                # single-column path (XLA folds the transposes into the
                # matmul's dimension numbers — no extra cost)
                return Ut.at[:, :nL].add(
                    (hier.coarse_inv @ Bt[:, :nL].T).T
                )
            return Ut.at[:nL].add(hier.coarse_inv @ Bt[:nL])
        npad = Bt.shape[-1]
        dinv_t = _pad_flat(1.0 / level.diag, npad)
        sgs_t = ()
        if cfg.smoother == SmootherType.MULTICOLOR_GS and level.group_mask:
            sgs_t = tuple(
                _pad_flat(m / level.diag, npad) for m in level.group_mask
            )
        Ut = relax(level, Bt, Ut, cfg.pre_relax_iter, dinv_t, sgs_t)
        r = well_apply(level.Aw, Ut, epi="resid", b=Bt, unpadded=False)
        nxt = hier.levels[lv + 1]
        rc = well_apply(nxt.PTw, r, unpadded=False)
        uc = go(lv + 1, rc, jnp.zeros_like(rc))
        Ut = well_apply(nxt.Pw, uc, epi="add", u=Ut, unpadded=False)
        return relax(level, Bt, Ut, cfg.post_relax_iter, dinv_t, sgs_t)

    n = b.shape[-1]
    npad0 = _nb_of(hier.levels[0]) * B_ROWS
    z = go(0, pad(b, npad0), pad(u, npad0))
    if n == npad0:
        return z
    return z[:, :n] if planes else z[:n]


def vcycle(
    hier: DeviceHierarchy,
    b: jnp.ndarray,
    u: jnp.ndarray,
    cfg: SolveConfig = SolveConfig(),
) -> jnp.ndarray:
    """One V-cycle on the finest level (recursion unrolled; jittable).

    b/u: flat [n] or multi-column [n, C] (the latter runs the batched
    planes kernels when the hierarchy is windowed)."""
    lv0 = hier.levels[0]
    if (
        getattr(cfg, "tiled_vcycle", True)
        and lv0.Aw is not None
        and not (
            cfg.smoother == SmootherType.MULTICOLOR_GS
            and lv0.groups
            and not lv0.group_mask
        )
    ):
        if b.ndim == 1:
            return _vcycle_tiled(hier, b, u, cfg)
        return _vcycle_tiled(hier, b.T, u.T, cfg).T

    def go(lv: int, B, U):
        level = hier.levels[lv]
        if lv == hier.n_levels - 1:
            # additive coarse correction (reference src/mg_VCycle.cpp:181-201)
            return U + hier.coarse_inv @ B
        U = _relax(level, B, U, cfg, cfg.pre_relax_iter)
        r = B - any_spmv(level.Aw if level.Aw is not None else level.A, U)
        nxt = hier.levels[lv + 1]
        rc = any_spmv(nxt.PTw if nxt.PTw is not None else nxt.PT, r)
        uc = jnp.zeros(
            rc.shape if r.ndim > 1 else (nxt.diag.shape[0],), dtype=r.dtype
        )
        uc = go(lv + 1, rc, uc)
        U = U + any_spmv(nxt.Pw if nxt.Pw is not None else nxt.P, uc)
        U = _relax(level, B, U, cfg, cfg.post_relax_iter)
        return U

    return go(0, b, u)


@functools.partial(jax.jit, static_argnames=("max_iter", "cfg"))
def solve_loop(
    hier: DeviceHierarchy,
    rhs: jnp.ndarray,
    z0: jnp.ndarray,
    tol: jnp.ndarray,
    max_iter: int,
    cfg: SolveConfig,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Reference solve loop (src/min_quad_with_fixed_mg.cpp:330-347):
    each iteration records ||rhs - A z|| (Frobenius norm for multi-RHS),
    stops *before* cycling when below tol. Returns (z, r_his, n_recorded);
    r_his is padded to max_iter with -1.
    """
    lv0 = hier.levels[0]
    A0 = lv0.Aw if lv0.Aw is not None else lv0.A

    def resid(z):
        if isinstance(A0, (WellMatrix, tuple)):
            if rhs.ndim == 1:
                r = well_apply(A0, z, epi="resid", b=rhs)
            else:  # planes-batched fused residual, one kernel for all cols
                r = well_apply(A0, z.T, epi="resid", b=rhs.T)
        else:
            r = rhs - any_spmv(A0, z)
        return jnp.sqrt((r * r).sum())

    def cond(state):
        k, _, _, done = state
        return jnp.logical_and(~done, k < max_iter)

    def body(state):
        k, z, r_his, _ = state
        res = resid(z)
        r_his = r_his.at[k].set(res)
        done = res < tol
        z = jax.lax.cond(done, lambda zz: zz, lambda zz: vcycle(hier, rhs, zz, cfg), z)
        return (k + 1, z, r_his, done)

    r_his0 = jnp.full((max_iter,), -1.0, dtype=rhs.dtype)
    k, z, r_his, _ = jax.lax.while_loop(cond, body, (0, z0, r_his0, jnp.asarray(False)))
    return z, r_his, k


@functools.partial(jax.jit, static_argnames=("max_iter", "cfg"))
def solve_loop_ir(
    hier: DeviceHierarchy,
    A64: ELLMatrix,
    rhs: jnp.ndarray,
    z0: jnp.ndarray,
    tol: jnp.ndarray,
    max_iter: int,
    cfg: SolveConfig,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Mixed-precision iterative refinement (the TPU dtype policy for
    tolerances below the f32 residual floor, DESIGN.md "Precision policy").

    The V-cycle and its whole operator hierarchy stay f32 — the fast path
    on TPU — while the outer defect correction runs in f64 (double-word
    emulation on TPU: slow per-op, but only ONE f64 SpMV + axpy per cycle):

        r_k = b - A z_k          (f64, A64 = finest operator in f64)
        e_k = Vcycle(r_k, 0)     (f32)
        z_{k+1} = z_k + e_k      (f64 accumulate)

    A V-cycle is an affine iteration u + B(b - A u) with linear B, so in
    exact arithmetic these iterates equal solve_loop's — r_his is directly
    comparable with the reference's (residual recorded before each cycle,
    break on tol, src/min_quad_with_fixed_mg.cpp:330-347), but the
    attainable floor is f64's ~1e-15 instead of f32's ~1e-6 relative.
    """
    f32 = hier.levels[0].diag.dtype

    def cond(state):
        k, _, _, done = state
        return jnp.logical_and(~done, k < max_iter)

    def body(state):
        k, z, r_his, _ = state
        r = rhs - ell_spmv(A64, z)
        res = jnp.sqrt((r * r).sum())
        r_his = r_his.at[k].set(res)
        done = res < tol
        e = vcycle(hier, r.astype(f32), jnp.zeros(r.shape, dtype=f32), cfg)
        z = jax.lax.cond(
            done, lambda zz: zz, lambda zz: zz + e.astype(z.dtype), z
        )
        return (k + 1, z, r_his, done)

    z0 = z0.astype(rhs.dtype)
    r_his0 = jnp.full((max_iter,), -1.0, dtype=rhs.dtype)
    k, z, r_his, _ = jax.lax.while_loop(
        cond, body, (0, z0, r_his0, jnp.asarray(False))
    )
    return z, r_his, k
