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
map carries the PT A P contraction weights with input ids mapped to slot
positions.  Chaining in slot space means each level's output feeds the
next level's kernel directly — no gathers anywhere on the value path.

TWO-STAGE FACTORIZATION (round 4).  The one-stage map G_{l+1}
[slots_{l+1} x slots_l] packs the ENTIRE triple product into one
operator, so its ELL width is the max CONTRIBUTION COUNT per coarse
entry — boundary-heavy hierarchies produce hub entries with 1000+
contributions (ogre lv1: width 1109, 223 kernel groups, 57M chain
block-iterations — benchmarks/probes/probe_two_stage.py).  Factoring
through the intermediate B = A·P splits it into
    G1: B-slots <- A-slots, weight P[j, c]   (fine-local; ~1 group)
    G2: C-slots <- B-slots, weight P[i, r]   (support-local)
with degree-sized widths; measured host cost models (probe_two_stage2):
bunny 16 -> 5 groups / 5.7x fewer chain blocks, ogre 223 -> ~17 groups
with wide-row extraction.  The composition G2·G1 = G is exact (same
scalar products, reassociated sums).

WIDE-ROW EXTRACTION.  A tap's static span ht[k] is the max over blocks,
so a few rows whose support spans many sublanes (boundary hubs under the
induced ordering) poison every block's select chain.  Rows whose column
window exceeds a threshold are split out of the kernel operator into a
(rows, cols, vals) side path applied with one gather + segment_sum —
serial (~6.8 ns/element) but tiny by construction; the threshold is
chosen per operator by a host cost model (kernel chain blocks vs gather
elements vs launches).

Block (3x3) value chains run the SAME per-level maps on each of the 9
element planes (the scalar weights are shared; reference
src/get_prolong.cpp:59-115 block P = same scalar weight per DOF).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from surface_multigrid_code_tpu.ops.well import (
    B_ROWS,
    LANE,
    build_well_auto,
    well_apply,
)
from surface_multigrid_code_tpu.solver.galerkin import galerkin_triples

# host cost-model constants (BASELINE.md "Re-baselined kernel target";
# CLAUDE.md measured gather facts); launches estimated from bunny's
# 17-kernel 0.15 ms refresh
_KERNEL_NS = 2.6
_GATHER_NS = 6.8
_LAUNCH_NS = 8000.0
# extraction thresholds swept by the cost model (window sublanes)
_EXTRACT_SWEEP = (None, 128, 64, 32)
# skip candidates whose dense ELL staging would exceed this many cells
# (one-stage hub maps: ogre lv1 is 1109 wide = 1.6 GB per staged array)
_STAGE_CELL_CAP = 150_000_000


class ChainTooWide(Exception):
    """The chain's operators would need more kernel groups than
    max_groups allows even after two-stage factorization and wide-row
    extraction — each group is its own Mosaic kernel compile (minutes
    each on pathological maps), so callers fall back to the XLA
    plan-gather refresh instead."""


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


def _stage1_map(A: sp.csr_matrix, P: sp.csr_matrix,
                slot_A: np.ndarray, nw_A: int):
    """G1: B-slots <- A-slots with weight P[j, c], for B = A @ P
    (symbolic pattern: no numeric cancellation — SSP prolongations carry
    exact-zero barycentric weights)."""
    A = A.tocsr()
    P = P.tocsr()
    Ab = A.copy()
    Ab.data = np.ones_like(Ab.data)
    Pb = P.copy()
    Pb.data = np.ones_like(Pb.data)
    B = (Ab @ Pb).tocsr()
    B.sum_duplicates()
    B.sort_indices()
    nB, wB, slot_B = _slot_space(B)
    Ai = np.repeat(np.arange(A.shape[0]), np.diff(A.indptr))
    Aj = A.indices
    Pcnt = np.diff(P.indptr)
    reps = Pcnt[Aj]
    t = np.repeat(np.arange(A.nnz), reps)
    offs = np.concatenate([[0], np.cumsum(reps)])
    local = np.arange(int(reps.sum())) - np.repeat(offs[:-1], reps)
    p_id = np.repeat(P.indptr[Aj], reps) + local
    out_r = Ai[t]
    out_c = P.indices[p_id]
    keys_B = (
        np.repeat(np.arange(nB), np.diff(B.indptr)).astype(np.int64)
        * B.shape[1] + B.indices
    )
    q = out_r.astype(np.int64) * B.shape[1] + out_c
    b_id = np.searchsorted(keys_B, q)
    G1 = sp.coo_matrix(
        (P.data[p_id], (slot_B[b_id], slot_A[t])), shape=(nB * wB, nw_A)
    ).tocsr()
    G1.sum_duplicates()
    return G1, B, slot_B, nB * wB


def _stage2_map(B: sp.csr_matrix, P: sp.csr_matrix, A_out: sp.csr_matrix,
                slot_B: np.ndarray, nw_B: int):
    """G2: C-slots <- B-slots with weight P[i, r], for C = P^T @ B."""
    B = B.tocsr()
    P = P.tocsr()
    C = A_out.tocsr()
    C.sort_indices()
    nC, wC, slot_C = _slot_space(C)
    Bi = np.repeat(np.arange(B.shape[0]), np.diff(B.indptr))
    Bc = B.indices
    Pcnt = np.diff(P.indptr)
    reps = Pcnt[Bi]
    u = np.repeat(np.arange(B.nnz), reps)
    offs = np.concatenate([[0], np.cumsum(reps)])
    local = np.arange(int(reps.sum())) - np.repeat(offs[:-1], reps)
    p_id = np.repeat(P.indptr[Bi], reps) + local
    out_r = P.indices[p_id]
    out_c = Bc[u]
    keys_C = (
        np.repeat(np.arange(nC), np.diff(C.indptr)).astype(np.int64)
        * C.shape[1] + C.indices
    )
    q = out_r.astype(np.int64) * C.shape[1] + out_c
    c_id = np.searchsorted(keys_C, q)
    G2 = sp.coo_matrix(
        (P.data[p_id], (slot_C[c_id], slot_B[u])), shape=(nC * wC, nw_B)
    ).tocsr()
    G2.sum_duplicates()
    return G2, slot_C


def _row_window_spread(G: sp.csr_matrix) -> np.ndarray:
    """Per-row column-window extent in sublanes (the quantity that
    poisons static per-tap spans when it outliers)."""
    rows = np.repeat(np.arange(G.shape[0]), np.diff(G.indptr))
    sub = G.indices // LANE
    lo = np.full(G.shape[0], np.int64(1) << 40)
    hi = np.full(G.shape[0], np.int64(-1))
    np.minimum.at(lo, rows, sub)
    np.maximum.at(hi, rows, sub)
    return np.where(hi >= 0, hi - lo + 1, 0)


def _tap_cost(G: sp.csr_matrix, cap: int):
    """(sum_ht, groups, nb): tap-layout select-chain cost of G (mirrors
    ops/well.build_well_tap staging, host-only)."""
    G = G.tocsr()
    n = G.shape[0]
    counts = np.diff(G.indptr)
    w = max(int(counts.max(initial=0)), 1)
    nb = max(-(-n // B_ROWS), 1)
    if nb * B_ROWS * w > _STAGE_CELL_CAP:
        return None  # too wide to even stage — caller must not pick this
    n_pad = nb * B_ROWS
    idx = np.zeros((n_pad, w), dtype=np.int64)
    struct = np.zeros((n_pad, w), dtype=bool)
    if G.nnz:
        rows = np.repeat(np.arange(n), counts)
        offs = np.arange(G.nnz) - np.repeat(G.indptr[:-1], counts)
        idx[rows, offs] = G.indices
        struct[rows, offs] = True
    sub = (idx // LANE).reshape(nb, B_ROWS, w)
    st = struct.reshape(nb, B_ROWS, w)
    big = np.int64(1) << 40
    sub_min = np.where(st, sub, big).min(axis=1)
    sub_max = np.where(st, sub, np.int64(-1)).max(axis=1)
    empty = sub_max < 0
    start = np.where(empty, 0, sub_min // 8 * 8)
    span = np.where(empty, 1, sub_max - start + 1)
    ht = (-(-np.maximum(span.max(axis=0), 1) // 8) * 8).astype(np.int64)
    groups, acc = 1, 0
    for h in ht:
        if acc and acc + int(h) > cap:
            groups += 1
            acc = 0
        acc += int(h)
    return int(ht.sum()), groups, nb


def _split_wide_rows(G: sp.csr_matrix, T: int | None):
    """(G_narrow, wide_coo | None): rows whose window spread exceeds T
    sublanes go to the serial side path."""
    if T is None:
        return G, None
    G = G.tocsr()
    spread = _row_window_spread(G)
    wide = spread > T
    if not wide.any():
        return G, None
    rows = np.repeat(np.arange(G.shape[0]), np.diff(G.indptr))
    m = wide[rows]
    Gn = sp.csr_matrix(
        (G.data[~m], (rows[~m], G.indices[~m])), shape=G.shape
    )
    Gn.sum_duplicates()
    wide_coo = (
        rows[m].astype(np.int32),
        G.indices[m].astype(np.int32),
        G.data[m],
    )
    return Gn, wide_coo


def _plan_op(G: sp.csr_matrix, cap: int, extract_T="auto"):
    """Pick the extraction threshold minimizing the modeled apply cost.

    Returns (G_narrow, wide_coo | None, predicted_groups, cost).  The
    sweep only runs when the unsplit layout is already expensive (cheap
    meshes never pay the extra staging passes).  extract_T: "auto"
    (cost-model sweep), None (never extract), or a fixed sublane
    threshold (tests force extraction on small meshes with it)."""
    if extract_T != "auto":
        Gn, wide = _split_wide_rows(G, extract_T)
        c = _tap_cost(Gn, cap)
        if c is None:
            raise ChainTooWide(
                f"operator too wide to stage (shape {G.shape})"
            )
        s, g, nb = c
        cost = s * nb * _KERNEL_NS + g * _LAUNCH_NS
        if wide is not None:
            cost += len(wide[0]) * _GATHER_NS
        return Gn, wide, g, cost
    full = _tap_cost(G, cap)
    best = None
    if full is not None:
        s, g, nb = full
        cost = s * nb * _KERNEL_NS + g * _LAUNCH_NS
        best = (cost, None, g)
    if best is None or best[0] > 1.5e6 or best[2] > 2:
        for T in _EXTRACT_SWEEP:
            if T is None:
                continue
            Gn, wide = _split_wide_rows(G, T)
            if wide is None:
                continue
            c = _tap_cost(Gn, cap)
            if c is None:
                continue
            s, g, nb = c
            cost = (
                s * nb * _KERNEL_NS
                + len(wide[0]) * _GATHER_NS
                + g * _LAUNCH_NS
            )
            if best is None or cost < best[0]:
                best = (cost, T, g)
    if best is None:
        raise ChainTooWide(
            f"operator too wide to stage (shape {G.shape})"
        )
    _, T, g = best
    Gn, wide = _split_wide_rows(G, T)
    return Gn, wide, g, best[0]


class WellRefreshChain:
    """Per-level well operators for the slot-space value chain.

    pattern0 / Ps must already be in the kernel's (induced-RCM) ordering.
    Exposes, per level lv: ell_shape (n, w), ell_indices [n, w] (device),
    diag_slots [n] (device), and ops[lv] — a tuple of stage operators
    (each a (wells_tuple, wide | None) pair) chained in order.  The
    per-level patterns are the full SYMBOLIC PT A P chains
    (galerkin.galerkin_triples), matching build_galerkin_plan's.

    mode: "two" (default — factor each level through B = A·P),
    "one" (legacy single G per level), "auto" (= "two"; the host cost
    models in benchmarks/probes/probe_two_stage*.py measured two-stage
    cheaper on every hierarchy tried: bunny 16 -> 5 groups / 5.7x fewer
    chain block-iterations, ogre 223 -> ~17 groups).
    """

    def __init__(self, pattern0: sp.spmatrix, Ps: list[sp.spmatrix],
                 dtype=jnp.float32, cap: int = 2048,
                 max_groups: int | None = 64, mode: str = "two",
                 extract_T="auto"):
        # cap: unroll budget per kernel group — G operators can be wide,
        # and wide groups overflow Mosaic's 16M scoped-VMEM stack even
        # under the default _UNROLL_CAP; a tighter cap splits them into
        # more, smaller chained kernels (G is value-static, so any
        # grouping is fine).
        # max_groups: total kernel-group budget across the chain — each
        # group is its own Mosaic compile; raise ChainTooWide beyond it.
        if mode == "auto":
            mode = "two"
        assert mode in ("one", "two"), mode
        self.dtype = dtype
        A = pattern0.tocsr().copy()
        A.sum_duplicates()
        n, w, slot = _slot_space(A)

        self._n_groups = 0
        budget = max_groups if max_groups is not None else 1 << 30

        def build_op(M):
            Gn, wide, g_pred, _cost = _plan_op(M, cap, extract_T=extract_T)
            self._n_groups += g_pred
            if self._n_groups > budget:
                raise ChainTooWide(
                    f"chain needs >{budget} kernel groups"
                )
            wells = build_well_auto(Gn, dtype=dtype, cap=cap)
            op_wide = None
            if wide is not None:
                rows, cols, vals = wide
                op_wide = (
                    jnp.asarray(rows),
                    jnp.asarray(cols),
                    jnp.asarray(vals, dtype=dtype),
                )
            return (wells, op_wide)

        self.patterns = [A]
        self.ell_shapes = [(n, w)]
        self.ell_indices = [jnp.asarray(_ell_indices(A, n, w, slot))]
        self.diag_slots = [jnp.asarray(_diag_slots(A, n, w, slot))]
        # level 0: 0/1 fill from the canonical nnz vector into slots
        fill = sp.csr_matrix(
            (np.ones(A.nnz), (slot, np.arange(A.nnz))),
            shape=(n * w, A.nnz),
        )
        self.ops = [(build_op(fill),)]
        prev_slot, prev_nw = slot, n * w
        for P in Ps:
            P = P.tocsr()
            if mode == "two":
                G1, B, slot_B, nw_B = _stage1_map(A, P, prev_slot, prev_nw)
                # the symbolic coarse pattern (galerkin_triples' A_out)
                # defines the canonical slot space the chain must land in
                _seg, _in, _wgt, A_out = galerkin_triples(A, P)
                G2, slot_c = _stage2_map(B, P, A_out, slot_B, nw_B)
                nc, wc, slot_c = _slot_space(A_out)
                level_ops = (build_op(G1), build_op(G2))
            else:
                seg, in_id, wgt, A_out = galerkin_triples(A, P)
                nc, wc, slot_c = _slot_space(A_out)
                G = sp.coo_matrix(
                    (wgt, (slot_c[seg], prev_slot[in_id])),
                    shape=(nc * wc, prev_nw),
                ).tocsr()
                G.sum_duplicates()
                level_ops = (build_op(G),)
            self.ops.append(level_ops)
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
            "ops": tuple(tuple(level) for level in self.ops),
            "ell_indices": tuple(self.ell_indices),
            "diag_slots": tuple(self.diag_slots),
        }

    @staticmethod
    def _apply_op(op, x: jnp.ndarray) -> jnp.ndarray:
        """One stage operator on a flat slot/nnz vector (padded in,
        padded out): windowed kernel groups + the optional wide-row
        serial side path (gather + segment_sum — tiny by construction)."""
        wells, wide = op
        y = well_apply(wells, x, unpadded=False)
        if wide is not None:
            rows, cols, vals = wide
            contrib = jax.ops.segment_sum(
                vals * x[cols], rows, num_segments=y.shape[0]
            )
            y = y + contrib
        return y

    def apply_planes(self, state, v_planes: jnp.ndarray):
        """Run the chain on [planes, nnz_in] value planes.

        Returns per-level slot-space planes [planes, n_lv * w_lv]
        (sliced to logical slots), finest first.  Jit-friendly: one
        well_apply per (stage op, plane), no dynamic gathers on the
        kernel path."""
        outs = []
        x = v_planes
        for lv, level_ops in enumerate(state["ops"]):
            n, w = self.ell_shapes[lv]
            cols = []
            for p in range(x.shape[0]):
                xp = x[p]
                for op in level_ops:
                    xp = self._apply_op(op, xp)
                cols.append(xp)
            y = jnp.stack(cols)[:, : n * w]
            outs.append(y)
            x = y
        return outs
