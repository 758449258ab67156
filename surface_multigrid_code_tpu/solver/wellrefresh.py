"""Galerkin value refresh as windowed-kernel SpMVs.

The cached-symbolic refresh (solver/galerkin.refresh_values and the BSR
variant) evaluates, per level, vals_out[t] = sum_k w_k * vals_in[b_k] —
a LINEAR map, i.e. an SpMV with a static host-built matrix G.  The
gather-plan implementation rides XLA's dynamic gather, which this TPU
executes serially (~6.8 ns/element, CLAUDE.md "Measured TPU gather
facts"); at bunny_15K block scale one refresh costs ~79 ms and the
balloon step runs 10+1 of them (probe_balloon_parts.py).  Under the
induced-RCM ordering (solver/ordering.py) G is BANDED — contributions
to coarse entry (r, c) come from fine entries (i, j) with i, j in the
fine neighborhoods of r, c, which the ordering keeps local — so G runs
on the windowed Pallas kernel (ops/well.py) like any other operator.

Spaces: values live in per-level ELL-SLOT space (row-major [n*w], slot
(r, k) = r*w + k, padding slots zero).  Level 0's map is the 0/1 "fill"
matrix from the user's canonical CSR nnz vector into slots; level l+1's
map G_{l+1} [slots_{l+1} x slots_l] carries the PT A P contraction
weights (galerkin.galerkin_triples) with input ids mapped to slot
positions.  Chaining in slot space means each level's output feeds the
next level's kernel directly — no gathers anywhere on the value path.

Block (3x3) value chains run the SAME per-level G on each of the 9
element planes (the scalar weights are shared; reference
src/get_prolong.cpp:59-115 block P = same scalar weight per DOF).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

from surface_multigrid_code_tpu.ops.well import (
    build_well_auto,
    well_apply,
    well_tap_group_count,
)
from surface_multigrid_code_tpu.solver.galerkin import galerkin_triples


class ChainTooWide(Exception):
    """The chain's operators would need more kernel groups than
    max_groups allows — each group is its own Mosaic kernel compile
    (minutes each on wide boundary-heavy Galerkin maps), so callers fall
    back to the XLA plan-gather refresh instead."""


def _slot_space(pattern: sp.csr_matrix):
    """(n, w, slot[nnz]): ELL width and the slot position of each nnz of
    a canonical-CSR pattern (matches galerkin._ell_layout's layout)."""
    pattern = pattern.tocsr()
    n = pattern.shape[0]
    counts = np.diff(pattern.indptr)
    w = max(int(counts.max(initial=0)), 1)
    rows = np.repeat(np.arange(n), counts)
    offs = np.arange(pattern.nnz) - np.repeat(pattern.indptr[:-1], counts)
    slot = rows * w + offs
    return n, w, slot.astype(np.int64)


def _ell_indices(pattern: sp.csr_matrix, n: int, w: int,
                 slot: np.ndarray) -> np.ndarray:
    """Padded column-id table [n, w] (padding -> column 0, weight zero by
    construction of the value chain)."""
    idx = np.zeros(n * w, dtype=np.int32)
    idx[slot] = pattern.indices
    return idx.reshape(n, w)


def _diag_slots(pattern: sp.csr_matrix, n: int, w: int,
                slot: np.ndarray) -> np.ndarray:
    """Slot position of each row's diagonal entry (must exist)."""
    pattern = pattern.tocsr()
    rows = np.repeat(np.arange(n), np.diff(pattern.indptr))
    mask = rows == pattern.indices
    dslots = slot[mask]
    assert dslots.shape[0] == n, "missing diagonal entries"
    return dslots.astype(np.int64)


class WellRefreshChain:
    """Per-level well operators for the slot-space value chain.

    pattern0 / Ps must already be in the kernel's (induced-RCM) ordering.
    Exposes, per level lv: ell_shape (n, w), ell_indices [n, w] (device),
    diag_slots [n] (device), and wells[lv] (well operator tuple).  The
    per-level patterns are the full SYMBOLIC PT A P chains
    (galerkin.galerkin_triples), matching build_galerkin_plan's.
    """

    def __init__(self, pattern0: sp.spmatrix, Ps: list[sp.spmatrix],
                 dtype=jnp.float32, cap: int = 2048,
                 max_groups: int | None = 64):
        # cap: unroll budget per kernel group — G operators can be very
        # wide (bunny bending: up to ~150 contributions per coarse entry),
        # and wide groups overflow Mosaic's 16M scoped-VMEM stack even
        # under the default _UNROLL_CAP; a tighter cap splits them into
        # more, smaller chained kernels (G is value-static, so any
        # grouping is fine).
        # max_groups: total kernel-group budget across the chain — each
        # group is its own Mosaic compile; raise ChainTooWide beyond it
        # (measured: ogre's boundary-heavy maps need 223 groups = 40+ min
        # of compiles, bunny 17).
        A = pattern0.tocsr().copy()
        A.sum_duplicates()
        n, w, slot = _slot_space(A)

        n_groups = 0

        def build(M):
            nonlocal n_groups
            if max_groups is not None:
                n_groups += well_tap_group_count(M, cap=cap)
                if n_groups > max_groups:
                    raise ChainTooWide(
                        f"chain needs >{max_groups} kernel groups"
                    )
            return build_well_auto(M, dtype=dtype, cap=cap)

        self.patterns = [A]
        self.ell_shapes = [(n, w)]
        self.ell_indices = [jnp.asarray(_ell_indices(A, n, w, slot))]
        self.diag_slots = [jnp.asarray(_diag_slots(A, n, w, slot))]
        # level 0: 0/1 fill from the canonical nnz vector into slots
        fill = sp.csr_matrix(
            (np.ones(A.nnz), (slot, np.arange(A.nnz))),
            shape=(n * w, A.nnz),
        )
        self.wells = [build(fill)]
        prev_slot, prev_nw = slot, n * w
        for P in Ps:
            seg, in_id, wgt, A_out = galerkin_triples(A, P.tocsr())
            nc, wc, slot_c = _slot_space(A_out)
            G = sp.coo_matrix(
                (wgt, (slot_c[seg], prev_slot[in_id])),
                shape=(nc * wc, prev_nw),
            ).tocsr()
            G.sum_duplicates()
            self.wells.append(build(G))
            self.patterns.append(A_out)
            self.ell_shapes.append((nc, wc))
            self.ell_indices.append(
                jnp.asarray(_ell_indices(A_out, nc, wc, slot_c)))
            self.diag_slots.append(
                jnp.asarray(_diag_slots(A_out, nc, wc, slot_c)))
            A, prev_slot, prev_nw = A_out, slot_c, nc * wc

    def state(self):
        """Jit-passable leaves (well operators + static index tables)."""
        return {
            "wells": tuple(self.wells),
            "ell_indices": tuple(self.ell_indices),
            "diag_slots": tuple(self.diag_slots),
        }

    def apply_planes(self, state, v_planes: jnp.ndarray):
        """Run the chain on [planes, nnz_in] value planes.

        Returns per-level slot-space planes [planes, n_lv * w_lv]
        (sliced to logical slots), finest first.  Jit-friendly: one
        well_apply per (level, plane), no dynamic gathers.
        """
        outs = []
        x = v_planes
        for lv, W in enumerate(state["wells"]):
            n, w = self.ell_shapes[lv]
            y = jnp.stack([
                well_apply(W, x[p], unpadded=False)
                for p in range(x.shape[0])
            ])
            y = y[:, : n * w]
            outs.append(y)
            x = y
        return outs
