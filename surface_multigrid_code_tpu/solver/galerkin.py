"""Device-side Galerkin coarsening with cached symbolic structure.

The reference recomputes A_{l+1} = P^T A_l P with Eigen SpGEMM inside the
application hot loops — every MCF time step (05_example_mean_curvature_flow/
main.cpp:74) and every balloon Newton iteration
(implicit_euler_mg_balloon.h:75).  The hierarchy P is FIXED, so the
sparsity of every Galerkin product is static; only values change.

We therefore precompute, per level, the symbolic expansion
    A_out[k] = sum_{(a,b,c) in triples(k)} P[a] * A_in[b] * P[c]
and fold the static P*P weight products into a single coefficient array,
reducing each per-solve coarsening to

    vals_out = segment_sum(w * A_in_vals[idx], seg)        (one fused pass)

followed by a static scatter into the level's ELL layout.  The whole
multi-level refresh jits into one device program — XLA fuses the gathers,
multiplies and segment-sums; no host SpGEMM in the hot loop.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class LevelPlan:
    """Symbolic PtAP for one level (static per hierarchy).

    Registered as a pytree so plans can be passed as jit ARGUMENTS —
    closure-capturing these (multi-million-entry) arrays would embed them
    as compile-time constants, which on the remote-compile backend ships
    hundreds of MB per compilation."""

    idx_in: jnp.ndarray   # [n_triples] index into A_in nnz values
    w: jnp.ndarray        # [n_triples] folded P[a] * P[c] weights
    seg: jnp.ndarray      # [n_triples] output nnz id (sorted)
    nnz_out: int
    # scatter of output nnz values into the ELL (indices,data) layout
    ell_rows: jnp.ndarray  # [nnz_out]
    ell_cols: jnp.ndarray  # [nnz_out] slot within the padded row
    ell_shape: tuple[int, int]
    ell_indices: jnp.ndarray  # static int32 [n, width] column ids
    diag_idx: jnp.ndarray     # [n] nnz id of each diagonal entry

    def tree_flatten(self):
        children = (
            self.idx_in, self.w, self.seg, self.ell_rows, self.ell_cols,
            self.ell_indices, self.diag_idx,
        )
        return children, (self.nnz_out, self.ell_shape)

    @classmethod
    def tree_unflatten(cls, aux, children):
        idx_in, w, seg, ell_rows, ell_cols, ell_indices, diag_idx = children
        return cls(
            idx_in=idx_in, w=w, seg=seg, nnz_out=aux[0], ell_rows=ell_rows,
            ell_cols=ell_cols, ell_shape=aux[1], ell_indices=ell_indices,
            diag_idx=diag_idx,
        )


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class GalerkinPlan:
    levels: tuple[LevelPlan, ...]
    # finest-level ELL layout (same fields for level 0)
    lvl0: LevelPlan

    def tree_flatten(self):
        return (self.levels, self.lvl0), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(levels=children[0], lvl0=children[1])


def _ell_layout(A: sp.csr_matrix, min_width: int = 1):
    """Static ELL layout of a CSR pattern: per-nnz (row, slot) + padded
    column ids (padding points at row 0 with weight 0 — ops/sparse.py)."""
    n, _ = A.shape
    counts = np.diff(A.indptr)
    width = max(int(counts.max(initial=0)), min_width)
    rows = np.repeat(np.arange(n), counts)
    slots = np.arange(A.nnz) - np.repeat(A.indptr[:-1], counts)
    indices = np.zeros((n, width), dtype=np.int32)
    indices[rows, slots] = A.indices
    # diagonal nnz ids
    diag_idx = np.zeros(n, dtype=np.int64)
    for i in range(n):
        lo, hi = A.indptr[i], A.indptr[i + 1]
        j = np.searchsorted(A.indices[lo:hi], i)
        assert lo + j < hi and A.indices[lo + j] == i, "missing diagonal"
        diag_idx[i] = lo + j
    return rows, slots, (n, width), indices, diag_idx


def _level_symbolic(A: sp.csr_matrix, P: sp.csr_matrix) -> LevelPlan:
    """Expand PT @ A @ P into (triple index, weight, output segment)."""
    A = A.tocsr()
    A.sum_duplicates()
    P = P.tocsr()
    P.sum_duplicates()
    nnzA = A.nnz
    # For A nnz (i, j, b): rows of the products are P columns of row i,
    # cols are P columns of row j.
    Ai = np.repeat(np.arange(A.shape[0]), np.diff(A.indptr))
    Aj = A.indices
    # expand over P rows i and j (each <= 3 nnz)
    Pptr, Pind = P.indptr, P.indices
    Pcnt = np.diff(Pptr)
    ci = Pcnt[Ai]  # count of left factors per A nnz
    cj = Pcnt[Aj]
    reps = ci * cj
    b = np.repeat(np.arange(nnzA), reps)  # A nnz id per triple
    # left/right P nnz offsets per triple via meshgrid within each A nnz
    total = int(reps.sum())
    # build local (u, v) grids: u in [0, ci), v in [0, cj)
    offs = np.concatenate([[0], np.cumsum(reps)])
    local = np.arange(total) - np.repeat(offs[:-1], reps)
    u = local // np.repeat(cj, reps)
    v = local % np.repeat(cj, reps)
    a = np.repeat(Pptr[Ai], reps) + u  # left P nnz id
    c = np.repeat(Pptr[Aj], reps) + v  # right P nnz id
    out_r = Pind[a]
    out_c = Pind[c]
    # sort by (out_r, out_c) to form segments
    nc = int(P.shape[1])
    key = out_r.astype(np.int64) * nc + out_c
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    uniq, seg = np.unique(key_s, return_inverse=True)
    nnz_out = uniq.shape[0]
    # output CSR pattern
    out_rows = (uniq // nc).astype(np.int64)
    out_cols = (uniq % nc).astype(np.int64)
    counts = np.bincount(out_rows, minlength=nc)
    indptr = np.concatenate([[0], np.cumsum(counts)])
    A_out = sp.csr_matrix(
        (np.zeros(nnz_out), out_cols, indptr), shape=(nc, nc)
    )
    rows, slots, shape, indices, diag_idx = _ell_layout(A_out)
    w = np.ones(total)  # weights folded below
    Pdat = P.data
    w = Pdat[a[order]] * Pdat[c[order]]
    return LevelPlan(
        idx_in=jnp.asarray(b[order]),
        w=jnp.asarray(w),
        seg=jnp.asarray(seg),
        nnz_out=nnz_out,
        ell_rows=jnp.asarray(rows),
        ell_cols=jnp.asarray(slots),
        ell_shape=shape,
        ell_indices=jnp.asarray(indices),
        diag_idx=jnp.asarray(diag_idx),
    )


def build_galerkin_plan(A0_pattern: sp.csr_matrix, Ps: list[sp.spmatrix]) -> GalerkinPlan:
    """Host symbolic setup: A0's ELL layout + per-level PtAP expansions.

    A0_pattern: finest-level matrix (pattern + any values); Ps[l] maps
    level l+1 -> level l as in mg_data.
    """
    A = A0_pattern.tocsr().copy()
    A.sum_duplicates()
    rows, slots, shape, indices, diag_idx = _ell_layout(A)
    lvl0 = LevelPlan(
        idx_in=jnp.zeros(0, dtype=jnp.int64),
        w=jnp.zeros(0),
        seg=jnp.zeros(0, dtype=jnp.int64),
        nnz_out=A.nnz,
        ell_rows=jnp.asarray(rows),
        ell_cols=jnp.asarray(slots),
        ell_shape=shape,
        ell_indices=jnp.asarray(indices),
        diag_idx=jnp.asarray(diag_idx),
    )
    levels = []
    A_sym = A
    for P in Ps:
        plan = _level_symbolic(A_sym, P.tocsr())
        levels.append(plan)
        # symbolic A for the next level: pattern only
        n_next = P.shape[1]
        counts = np.bincount(
            np.asarray(plan.ell_rows), minlength=n_next
        )
        indptr = np.concatenate([[0], np.cumsum(counts)])
        # reconstruct CSR pattern from the plan's sorted (row, col) layout
        cols = np.zeros(plan.nnz_out, dtype=np.int64)
        cols_from_ell = np.asarray(plan.ell_indices)
        cols = cols_from_ell[np.asarray(plan.ell_rows), np.asarray(plan.ell_cols)]
        A_sym = sp.csr_matrix(
            (np.ones(plan.nnz_out), cols, indptr), shape=(n_next, n_next)
        )
    return GalerkinPlan(levels=tuple(levels), lvl0=lvl0)


def refresh_values(plan: GalerkinPlan, A0_vals: jnp.ndarray, dtype=None,
                   raw: bool = False):
    """All-level Galerkin value refresh on device.

    A0_vals: finest-level CSR nnz values (pattern = the one given to
    build_galerkin_plan).  Returns per-level (ell_data [n,width], diag [n]),
    finest first — or, with raw=True, the per-level nnz value VECTORS in
    canonical CSR order (for consumers with their own layouts, e.g. the
    sharded halo solver).  Jit-friendly: shapes static, one
    gather+segment_sum per level.
    """
    dtype = dtype or A0_vals.dtype
    vals = A0_vals.astype(dtype)
    out = []

    def to_ell(pl_, v):
        if raw:
            return v
        data = jnp.zeros(pl_.ell_shape, dtype=dtype)
        # destinations are unique and row-major sorted (plan construction)
        data = data.at[pl_.ell_rows, pl_.ell_cols].set(
            v, indices_are_sorted=True, unique_indices=True
        )
        return data, v[pl_.diag_idx]

    out.append(to_ell(plan.lvl0, vals))
    for pl_ in plan.levels:
        # seg is ascending by construction (sorted (row, col) expansion)
        vals = jax.ops.segment_sum(
            pl_.w.astype(dtype) * vals[pl_.idx_in],
            pl_.seg,
            num_segments=pl_.nnz_out,
            indices_are_sorted=True,
        )
        out.append(to_ell(pl_, vals))
    return out
