"""Windowed-ELL sparse matrix + Pallas TPU SpMV kernel.

Why this exists: every XLA dynamic-gather phrasing on this hardware lowers
to a serial ~6.4-cycle-per-element path (measured, benchmarks/probes/
probe_gather.py), which makes the ELL SpMV gather-bound at ~0.1 Gnnz/s —
400x off the HBM roofline. The reference's CPU SpMV
(src/mg_VCycle.cpp:146-177, Eigen CSC sweeps) has no such problem; a
TPU-native design must avoid the hardware gather entirely.

Design: rows are banded by an RCM-class ordering so each block of
B=1024 consecutive rows only references x inside a narrow window of
H sublane-rows (H*128 values, H is 16-72 for surface meshes). The kernel
keeps x resident in VMEM as [XR, 128]; for each row-block it reads the
window [H, 128] and resolves each gather element (hi, lo) with
  - a lane shuffle: jnp.take_along_axis(row_h, lo, axis=1)   (VPU)
  - a sublane one-hot select: where(hi == h, ., .)           (VPU)
i.e. ~2*H vector-tile ops per (tap, block) instead of a serial gather —
measured ~100x faster than the XLA gather path at mesh scale.

Element layout: row r of block b sits at tile (sublane r//128, lane
r%128); taps are stored tap-major as [nb, w, 8, 128] flattened to
[nb*w*8, 128] so a BlockSpec row-block of (w*8, 128) serves one grid step.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

B_ROWS = 1024          # rows per grid block (8 sublanes x 128 lanes)
LANE = 128
SUB = B_ROWS // LANE   # 8 sublane rows of output per block
# above this w*H the unrolled kernel body exceeds Mosaic's scoped-VMEM
# compile budget; such operators use the (slower) fori_loop body
_UNROLL_CAP = 4096


@jax.tree_util.register_pytree_node_class
@dataclass
class WellMatrix:
    """Windowed-ELL operator for the Pallas SpMV kernel.

    rb:  int32 [nb]          window start sublane-row per block (mult of 8)
    hb:  int32 [nb]          per-block window span (kernel loop bound <= H)
    hi:  int32 [nb*w*8,128]  window-relative sublane row of each element
    lo:  int32 [nb*w*8,128]  lane of each element
    dat: float [nb*w*8,128]  values (0 padding)
    n_rows / n_cols: logical shape;  w, H, XR: static layout params

    Tap-recentered mode (ob/ht set): each CSR tap slot k gets its OWN
    window start ob[b*w+k] (window-relative, 8-aligned) with static span
    ht[k]; hi is then relative to the TAP window, bounded by ht[k] instead
    of the whole-block span H — the select chain shrinks from w*H to
    sum_k ht[k] iterations.

    ob:  int32 [nb*w] | None   per-(block,tap) window start (mult of 8)
    ht:  tuple[int]   | None   per-tap static unroll bound (mult of 8)

    Diagonal (DIA) mode (q set, implies ob/ht set): the operator's band
    advances ~q window-sublanes per output sublane (q = qn/qd, e.g. 1 for
    square A, 4 for a 4:1 restriction PT, 1/4 for P). Candidates are
    diagonal offsets d = hi - floor(q*s): hi stores d per element, ht[k]
    is the per-tap candidate count, ob[b*w+k] is the per-(block,tap) load
    offset in TILES within the window, rb/XR live in an x space padded by
    xpad leading tiles. Each candidate reads a STATIC q-sloped 8-row
    pattern of the loaded window — span/8-ish iterations instead of span.

    q:    (qn, qd) | None      diagonal slope (static)
    xpad: int                  leading zero tiles in the padded x space
    """

    rb: jnp.ndarray
    hb: jnp.ndarray
    hi: jnp.ndarray
    lo: jnp.ndarray
    dat: jnp.ndarray
    n_rows: int
    n_cols: int
    w: int
    H: int
    XR: int
    ob: jnp.ndarray | None = None
    ht: tuple | None = None
    q: tuple | None = None
    xpad: int = 0

    @property
    def nb(self) -> int:
        return self.rb.shape[0]

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    def tree_flatten(self):
        return (self.rb, self.hb, self.hi, self.lo, self.dat, self.ob), (
            self.n_rows, self.n_cols, self.w, self.H, self.XR, self.ht,
            self.q, self.xpad)

    @classmethod
    def tree_unflatten(cls, aux, children):
        rb, hb, hi, lo, dat, ob = children
        n_rows, n_cols, w, H, XR, ht, q, xpad = aux
        return cls(rb, hb, hi, lo, dat, n_rows, n_cols, w, H, XR, ob, ht,
                   q, xpad)


def _host_pack(a, nb, w):
    """[nb*B_ROWS, w] -> tap-major [nb*w*8, 128] (host)."""
    a = a.reshape(nb, SUB, LANE, w)              # (b, sublane, lane, tap)
    return np.ascontiguousarray(
        a.transpose(0, 3, 1, 2)).reshape(nb * w * SUB, LANE)


def well_layout(A: sp.spmatrix, dtype=jnp.float32) -> WellMatrix:
    """Structural layout (rb/hb/hi/lo from the SPARSITY, dat zeroed) of a
    (pre-ordered!) scipy matrix.  Windows cover every STRUCTURAL nonzero,
    so the layout stays valid across value refreshes; slot order per row is
    canonical CSR — the same convention as ops/sparse.ell_from_csr and
    solver/galerkin's ell layouts, which well_repack relies on.

    The caller is responsible for a row/column ordering that keeps each
    1024-row block's column span narrow (solver/ordering.py); H is
    whatever the ordering achieves."""
    A = A.tocsr()
    A.sum_duplicates()
    n, m = A.shape
    counts = np.diff(A.indptr)
    w = max(int(counts.max(initial=0)), 1)
    nb = max(-(-n // B_ROWS), 1)
    n_pad = nb * B_ROWS

    # dense ELL staging [n_pad, w]; `struct` marks real (structural) slots
    idx = np.zeros((n_pad, w), dtype=np.int64)
    struct = np.zeros((n_pad, w), dtype=bool)
    if A.nnz:
        rows = np.repeat(np.arange(n), counts)
        offs = np.arange(A.nnz) - np.repeat(A.indptr[:-1], counts)
        idx[rows, offs] = A.indices
        struct[rows, offs] = True

    # per-block window starts (sublane rows, aligned down to 8) + spans
    rb = np.zeros(nb, dtype=np.int32)
    hb = np.zeros(nb, dtype=np.int32)
    H = 8
    for b in range(nb):
        blk = slice(b * B_ROWS, (b + 1) * B_ROWS)
        smask = struct[blk]
        if not smask.any():
            continue
        cols = idx[blk][smask]
        r0 = int(cols.min()) // LANE // 8 * 8
        r1 = int(cols.max()) // LANE
        rb[b] = r0
        hb[b] = r1 - r0 + 1
        H = max(H, r1 - r0 + 1)
    H = -(-H // 8) * 8

    loc = idx - (rb.repeat(B_ROWS) * LANE)[:, None]
    loc[~struct] = 0          # padding slots -> window-local (0, 0)
    hi = (loc // LANE).astype(np.int32)
    lo = (loc % LANE).astype(np.int32)
    assert hi.min() >= 0 and hi.max() < H, (hi.min(), hi.max(), H)

    XR = -(-m // LANE)
    XR = max(-(-XR // 8) * 8, int(rb.max()) + H)
    return WellMatrix(
        rb=jnp.asarray(rb),
        hb=jnp.asarray(hb),
        hi=jnp.asarray(_host_pack(hi, nb, w)),
        lo=jnp.asarray(_host_pack(lo, nb, w)),
        dat=jnp.zeros((nb * w * SUB, LANE), dtype=dtype),
        n_rows=n, n_cols=m, w=w, H=H, XR=XR,
    )


def well_repack(W: WellMatrix, ell_data: jnp.ndarray) -> WellMatrix:
    """New WellMatrix with values from a canonical [n, w] ELL data array
    (e.g. a Galerkin refresh output) — pure reshape/transpose on device,
    no gather."""
    nb, w = W.nb, W.w
    n_pad = nb * B_ROWS
    d = jnp.zeros((n_pad, w), dtype=W.dat.dtype)
    d = jax.lax.dynamic_update_slice(
        d, ell_data.astype(W.dat.dtype), (0, 0)
    )
    dat = (
        d.reshape(nb, SUB, LANE, w)
        .transpose(0, 3, 1, 2)
        .reshape(nb * w * SUB, LANE)
    )
    return WellMatrix(
        rb=W.rb, hb=W.hb, hi=W.hi, lo=W.lo, dat=dat,
        n_rows=W.n_rows, n_cols=W.n_cols, w=W.w, H=W.H, XR=W.XR,
        ob=W.ob, ht=W.ht, q=W.q, xpad=W.xpad,
    )


def _stage_ell(A: sp.spmatrix):
    """Canonical-CSR ELL staging: (idx, struct, val) as [nb*1024, w]."""
    A = A.tocsr()
    A.sum_duplicates()
    A.sort_indices()
    n, m = A.shape
    counts = np.diff(A.indptr)
    w = max(int(counts.max(initial=0)), 1)
    nb = max(-(-n // B_ROWS), 1)
    n_pad = nb * B_ROWS
    idx = np.zeros((n_pad, w), dtype=np.int64)
    struct = np.zeros((n_pad, w), dtype=bool)
    val = np.zeros((n_pad, w), dtype=np.float64)
    if A.nnz:
        rows = np.repeat(np.arange(n), counts)
        offs = np.arange(A.nnz) - np.repeat(A.indptr[:-1], counts)
        idx[rows, offs] = A.indices
        struct[rows, offs] = True
        val[rows, offs] = A.data
    return idx, struct, val, n, m, w, nb


def dia_costs(A: sp.spmatrix, q: tuple, staged=None) -> np.ndarray:
    """Per-tap candidate counts D_k under diagonal slope q=(qn, qd).
    sum(D) is the kernel's select-chain length (the quantity
    build_well_auto minimizes across slopes).

    Integer slopes qn > 1 (the phase-split kernel mode, build_well_diaq)
    quantize the per-(block,tap) base to 8*qn sublane rows — the phase
    planes' tile alignment — instead of 8."""
    idx, struct, val, n, m, w, nb = staged if staged else _stage_ell(A)
    qn, qd = q
    s_of = (np.arange(B_ROWS) // LANE)
    qf = (qn * s_of) // qd                                  # [1024]
    sub = (idx // LANE).reshape(nb, B_ROWS, w)
    st = struct.reshape(nb, B_ROWS, w)
    di = sub - qf[None, :, None]
    big = np.int64(1) << 40
    dmin = np.where(st, di, big).min(axis=1)                # [nb, w]
    dmax = np.where(st, di, -big).max(axis=1)
    empty = ~st.any(axis=1)
    dmin = np.where(empty, 0, dmin)
    dmax = np.where(empty, 0, dmax)
    align = 8 * qn if (qd == 1 and qn > 1) else 8
    ot = np.floor_divide(dmin, align)
    return (dmax - align * ot + 1).max(axis=0).astype(np.int64)  # D_k [w]


def build_well_dia(
    A: sp.spmatrix, dtype=jnp.float32, cap: int = _UNROLL_CAP,
    q: tuple = (1, 1), staged=None,
) -> tuple:
    """Diagonal-mode windowed layout(s) of a (pre-ordered!) matrix.

    Element (s, l) of an output tile is row 1024b+128s+l; for a banded
    operator with slope q = n_cols/n_rows its column's window sublane is
    ~ floor(q*s) + d with d nearly constant, so selecting over diagonal
    offsets d needs ~span/8 iterations instead of span (measured ~0.5x
    the tap-mode select cost, benchmarks/probes/probe_dia_windows.py).
    Slots keep canonical identity (well_repack_tap works unchanged)."""
    idx, struct, val, n, m, w, nb = staged if staged else _stage_ell(A)
    qn, qd = q
    if qd == 1 and qn != 1:
        return build_well_diaq(A, dtype=dtype, cap=cap, q=q, staged=staged)
    s_of = (np.arange(B_ROWS) // LANE)
    qf = (qn * s_of) // qd
    sub = (idx // LANE).reshape(nb, B_ROWS, w)
    st = struct.reshape(nb, B_ROWS, w)
    di3 = sub - qf[None, :, None]
    big = np.int64(1) << 40
    dmin = np.where(st, di3, big).min(axis=1)               # [nb, w]
    dmax = np.where(st, di3, -big).max(axis=1)
    empty = ~st.any(axis=1)
    dmin = np.where(empty, 0, dmin)
    dmax = np.where(empty, 0, dmax)

    ot_abs = np.floor_divide(dmin, 8)                       # tiles, may be <0
    xpad = int(max(0, -ot_abs.min()))
    pt = ot_abs + xpad                                      # >= 0
    D = (dmax - 8 * ot_abs + 1).max(axis=0).astype(np.int64)  # [w]
    qf7 = int(qf[-1])
    T = (D - 1 + qf7) // 8 + 1                              # tiles/tap [w]

    # per-block window (tiles, padded space)
    wt = np.where(empty.all(axis=1), 0, np.where(empty, big, pt).min(axis=1))
    pt = np.where(empty, wt[:, None], pt)
    ob = (pt - wt[:, None]).astype(np.int64)                # [nb, w]
    H8 = int((ob + T[None, :]).max())
    rb = (wt * 8).astype(np.int32)

    # per-element candidate index dd = di - 8*ot_abs
    dd = di3 - (8 * ot_abs)[:, None, :]
    dd = np.where(st, dd, 0).reshape(nb * B_ROWS, w)
    lo = np.where(struct, idx % LANE, 0).astype(np.int32)
    ddr = np.repeat(D[None, :], nb * B_ROWS, axis=0)
    assert dd.min() >= 0 and (dd < ddr).all(), (dd.min(), dd.max(), D)
    dd = dd.astype(np.int32)

    m_tiles = -(-(-(-m // LANE)) // 8)       # ceil(ceil(m/128)/8)
    XR8 = max(xpad + m_tiles, int((wt + H8).max()))
    # split into consecutive slot groups within the unroll budget
    groups = []
    k0, acc = 0, 0
    for k in range(w):
        if acc and acc + int(D[k]) > cap:
            groups.append((k0, k))
            k0, acc = k, 0
        acc += int(D[k])
    groups.append((k0, w))

    out = []
    for g0, g1 in groups:
        wg = g1 - g0
        obg = ob[:, g0:g1]
        Tg = T[g0:g1]
        H8g = int(max(1, (obg + Tg[None, :]).max()))
        XR8g = max(XR8, int((wt + H8g).max()))
        out.append(WellMatrix(
            rb=jnp.asarray(rb),
            hb=jnp.asarray(np.maximum((dmax - dmin + 1).max(axis=1), 1)
                           .astype(np.int32)),
            hi=jnp.asarray(_host_pack(dd[:, g0:g1], nb, wg)),
            lo=jnp.asarray(_host_pack(lo[:, g0:g1], nb, wg)),
            dat=jnp.asarray(_host_pack(val[:, g0:g1], nb, wg), dtype=dtype),
            n_rows=n, n_cols=m, w=wg, H=H8g * 8, XR=XR8g * 8,
            ob=jnp.asarray(obg.reshape(-1).astype(np.int32)),
            ht=tuple(int(d) for d in D[g0:g1]),
            q=(int(qn), int(qd)),
            xpad=xpad,
        ))
    return tuple(out)


def build_well_diaq(
    A: sp.spmatrix, dtype=jnp.float32, cap: int = _UNROLL_CAP,
    q: tuple = (4, 1), staged=None,
) -> tuple:
    """Integer-slope (qn >= 2) diagonal layout(s): the PHASE-SPLIT mode.

    A slope-qn operator (e.g. a 4:1 restriction PT) advances qn window
    sublane rows per output sublane; the per-candidate read is a
    stride-qn row pattern, which Mosaic cannot slice. The kernel instead
    reads x phase-split ([qn, XR/(8qn), 8, 128]; plane p holds sublane
    rows ≡ p mod qn — one XLA transpose per SpMV), where candidate
    dd = p + qn*j becomes a CONTIGUOUS 8-row slice of plane p at STATIC
    row offset j: per-candidate cost equals the slope-1 dia mode, and
    the chain runs over the true diagonal spread instead of the
    tap-mode span (~qn*8 + spread). Per-(block,tap) bases are aligned
    DOWN to 8*qn rows so the one prefetched tile offset per (block,tap)
    is phase-plane tile-aligned. Slots keep canonical identity
    (well_repack_tap works unchanged)."""
    idx, struct, val, n, m, w, nb = staged if staged else _stage_ell(A)
    qn, qd = q
    if qd != 1 or qn < 2:
        raise ValueError(f"build_well_diaq needs integer slope >= 2, got {q}")
    AL = 8 * qn
    s_of = np.arange(B_ROWS) // LANE
    qf = qn * s_of
    sub = (idx // LANE).reshape(nb, B_ROWS, w)
    st = struct.reshape(nb, B_ROWS, w)
    di3 = sub - qf[None, :, None]
    big = np.int64(1) << 40
    dmin = np.where(st, di3, big).min(axis=1)               # [nb, w]
    dmax = np.where(st, di3, -big).max(axis=1)
    empty = ~st.any(axis=1)
    dmin = np.where(empty, 0, dmin)
    dmax = np.where(empty, 0, dmax)

    base = np.floor_divide(dmin, AL) * AL                   # [nb, w]
    xpad_rows = -(-int(max(0, -base.min())) // AL) * AL
    baseP = base + xpad_rows
    D = (dmax + xpad_rows - baseP + 1).max(axis=0).astype(np.int64)  # [w]
    # per-block window start (sublane rows, padded space, mult of 8qn)
    wt = np.where(
        empty.all(axis=1), 0, np.where(empty, big, baseP).min(axis=1)
    )
    baseP = np.where(empty, wt[:, None], baseP)
    obq = ((baseP - wt[:, None]) // AL).astype(np.int64)    # [nb, w] tiles
    rbq = (wt // AL).astype(np.int32)                       # [nb] tiles

    dd = di3 + xpad_rows - baseP.reshape(nb, 1, w)
    dd = np.where(st, dd, 0).reshape(nb * B_ROWS, w)
    lo = np.where(struct, idx % LANE, 0).astype(np.int32)
    ddr = np.repeat(D[None, :], nb * B_ROWS, axis=0)
    assert dd.min() >= 0 and (dd < ddr).all(), (dd.min(), dd.max(), D)
    dd = dd.astype(np.int32)

    # per-tap per-phase tiles: rows j + s, j < ceil(D/qn), s < 8
    Tq = (-(-D // qn) + 7 + 7) // 8                         # ceil((ceil(D/qn)+7)/8)
    m_rows = -(-m // LANE)

    groups = []
    k0, acc = 0, 0
    for k in range(w):
        if acc and acc + int(D[k]) > cap:
            groups.append((k0, k))
            k0, acc = k, 0
        acc += int(D[k])
    groups.append((k0, w))

    out = []
    for g0, g1 in groups:
        wg = g1 - g0
        obg = obq[:, g0:g1]
        Tg = Tq[g0:g1]
        Hp8 = int(max(1, (obg + Tg[None, :]).max()))
        XRrows = max(xpad_rows + m_rows, int((rbq.max() + Hp8) * AL))
        XRrows = -(-XRrows // AL) * AL
        out.append(WellMatrix(
            rb=jnp.asarray(rbq),
            hb=jnp.asarray(np.maximum((dmax - dmin + 1).max(axis=1), 1)
                           .astype(np.int32)),
            hi=jnp.asarray(_host_pack(dd[:, g0:g1], nb, wg)),
            lo=jnp.asarray(_host_pack(lo[:, g0:g1], nb, wg)),
            dat=jnp.asarray(_host_pack(val[:, g0:g1], nb, wg), dtype=dtype),
            n_rows=n, n_cols=m, w=wg, H=Hp8 * AL, XR=XRrows,
            ob=jnp.asarray(obg.reshape(-1).astype(np.int32)),
            ht=tuple(int(d) for d in D[g0:g1]),
            q=(int(qn), 1),
            xpad=xpad_rows // 8,
        ))
    return tuple(out)


# slope candidates tried by build_well_auto, with per-candidate op-cost
# weights relative to tap mode (fractional slopes build the row pattern
# from ceil(8/qd) broadcasts + a concat; integer slopes >= 2 use the
# phase-split kernel mode, per-candidate cost ~ slope-1 dia)
_AUTO_QS = (
    ((1, 1), 1.0),
    ((2, 1), 1.05),
    ((3, 1), 1.05),
    ((4, 1), 1.05),
    ((1, 2), 2.3),
    ((1, 4), 1.7),
)


def well_tap_group_count(A: sp.spmatrix, cap: int = _UNROLL_CAP) -> int:
    """How many kernel groups a tap-recentered layout of A needs under
    the given unroll cap — WITHOUT packing/uploading anything (cheap
    host pass).  Each group compiles as its own Mosaic kernel (~10-60 s
    of TPU-side compile), so callers building CHAINS of operators use
    this to budget pathologically wide ones.  (solver/wellrefresh.py now
    plans with its own cost model — two-stage factorization + wide-row
    extraction — and no longer calls this; kept as the public cheap
    estimator.)"""
    idx, struct, val, n, m, w, nb = _stage_ell(A)
    sub = (idx // LANE).reshape(nb, B_ROWS, w)
    st = struct.reshape(nb, B_ROWS, w)
    big = np.int64(1) << 40
    sub_min = np.where(st, sub, big).min(axis=1)
    sub_max = np.where(st, sub, np.int64(-1)).max(axis=1)
    empty = sub_max < 0
    rb = np.where(
        np.where(empty, big, sub_min).min(axis=1) == big,
        0,
        np.where(empty, big, sub_min).min(axis=1) // 8 * 8,
    )
    ob = np.maximum(
        np.where(empty, 0, sub_min // 8 * 8 - rb[:, None]), 0
    )
    span = np.where(empty, 1, sub_max - (rb[:, None] + ob) + 1)
    ht = (-(-np.maximum(span.max(axis=0), 1) // 8) * 8).astype(np.int64)
    groups, acc = 1, 0
    for k in range(w):
        if acc and acc + int(ht[k]) > cap:
            groups += 1
            acc = 0
        acc += int(ht[k])
    return groups


def build_well_auto(
    A: sp.spmatrix, dtype=jnp.float32, cap: int = _UNROLL_CAP,
) -> tuple:
    """Pick the cheapest windowed layout for a (pre-ordered!) matrix:
    tap-recentered rows vs diagonal candidates across slopes, by
    weighted select-chain length. DIA must predict <0.9x tap to win
    (layout-choice hysteresis; both share canonical slot order, so
    well_repack_tap works on either). Stages the operator to ELL form
    once and shares it across all candidate evaluations + the build."""
    staged = _stage_ell(A)
    idx, struct, val, n, m, w, nb = staged
    sub = (idx // LANE).reshape(nb, B_ROWS, w)
    st = struct.reshape(nb, B_ROWS, w)
    big = np.int64(1) << 40
    sub_min = np.where(st, sub, big).min(axis=1)
    sub_max = np.where(st, sub, np.int64(-1)).max(axis=1)
    e2 = sub_max < 0
    start = np.where(e2, 0, sub_min // 8 * 8)
    span = np.where(e2, 1, sub_max - start + 1)
    cost_tap = float(sum(-(-int(s) // 8) * 8 for s in span.max(axis=0)))

    best_q, best_cost = None, cost_tap
    for q, wgt in _AUTO_QS:
        c = wgt * float(dia_costs(A, q, staged=staged).sum())
        if c < best_cost:
            best_q, best_cost = q, c
    if best_q is None or best_cost >= 0.9 * cost_tap:
        return build_well_tap(A, dtype=dtype, cap=cap, staged=staged)
    return build_well_dia(A, dtype=dtype, cap=cap, q=best_q, staged=staged)


def build_well_tap(
    A: sp.spmatrix, dtype=jnp.float32, cap: int = _UNROLL_CAP, staged=None
) -> tuple:
    """Tap-recentered windowed layout(s) of a (pre-ordered!) matrix.

    Each canonical-CSR tap slot k gets its own per-block window start
    (8-aligned) and a static per-tap span ht[k]; with slot-sorted columns
    the per-tap spans are far narrower than the whole-block span H, so
    the kernel's select chain shrinks from sum_s w_s*H_s (band slices) to
    sum_k ht[k] iterations (measured 0.5-0.7x, benchmarks/probes/
    probe_tap_windows.py).

    Slots keep their canonical identity (no cross-slot compaction), so a
    value refresh stays a pure reshape (well_repack_tap) — unlike
    build_well_sliced this layout serves BOTH static and value-refreshed
    operators. Consecutive slots are split into groups only when
    sum_k ht[k] would exceed the Mosaic unroll budget.
    """
    idx, struct, val, n, m, w, nb = staged if staged else _stage_ell(A)
    n_pad = nb * B_ROWS

    sub = (idx // LANE).reshape(nb, B_ROWS, w)
    st = struct.reshape(nb, B_ROWS, w)
    big = np.int64(1) << 40
    sub_min = np.where(st, sub, big).min(axis=1)          # [nb, w]
    sub_max = np.where(st, sub, np.int64(-1)).max(axis=1)  # [nb, w]
    empty = sub_max < 0

    # whole-block window start (shared DMA base), like well_layout
    blk_min = np.where(empty, big, sub_min).min(axis=1)   # [nb]
    rb = np.where(blk_min == big, 0, blk_min // 8 * 8).astype(np.int64)
    blk_max = sub_max.max(axis=1)                          # [nb]
    hb = np.maximum(blk_max - rb + 1, 1).astype(np.int32)

    # per-(block,tap) 8-aligned starts relative to rb, per-tap static spans
    ob = np.where(empty, 0, sub_min // 8 * 8 - rb[:, None])
    ob = np.maximum(ob, 0).astype(np.int64)               # [nb, w]
    span = np.where(empty, 1, sub_max - (rb[:, None] + ob) + 1)
    ht = (-(-np.maximum(span.max(axis=0), 1) // 8) * 8).astype(np.int64)

    # element coordinates relative to the TAP window
    base = (rb[:, None] + ob) * LANE                       # [nb, w]
    loc = idx - np.repeat(base, B_ROWS, axis=0)            # [n_pad, w]
    loc[~struct] = 0
    hi = (loc // LANE).astype(np.int32)
    lo = (loc % LANE).astype(np.int32)
    ht_rows = np.repeat(ht[None, :], n_pad, axis=0)
    assert hi.min() >= 0 and (hi < ht_rows).all(), (
        hi.min(), hi.max(), ht.tolist())

    # split consecutive slots into groups within the unroll budget
    groups = []
    k0 = 0
    acc = 0
    for k in range(w):
        if acc and acc + int(ht[k]) > cap:
            groups.append((k0, k))
            k0, acc = k, 0
        acc += int(ht[k])
    groups.append((k0, w))

    out = []
    for g0, g1 in groups:
        wg = g1 - g0
        obg = ob[:, g0:g1]
        htg = ht[g0:g1]
        Hg = int(max(8, (obg + htg[None, :]).max()))
        Hg = -(-Hg // 8) * 8
        XR = -(-m // LANE)
        XR = max(-(-XR // 8) * 8, int(rb.max()) + Hg)
        out.append(WellMatrix(
            rb=jnp.asarray(rb.astype(np.int32)),
            hb=jnp.asarray(hb),
            hi=jnp.asarray(_host_pack(hi[:, g0:g1], nb, wg)),
            lo=jnp.asarray(_host_pack(lo[:, g0:g1], nb, wg)),
            dat=jnp.asarray(
                _host_pack(val[:, g0:g1], nb, wg), dtype=dtype),
            n_rows=n, n_cols=m, w=wg, H=Hg, XR=XR,
            ob=jnp.asarray(obg.reshape(-1).astype(np.int32)),
            ht=tuple(int(h) for h in htg),
        ))
    return tuple(out)


def well_repack_tap(Ws, ell_data: jnp.ndarray):
    """Refresh the values of a build_well_tap output from a canonical
    [n, w] ELL data array — pure slice/reshape on device, no gather.
    Accepts a single WellMatrix or the tuple of consecutive tap groups."""
    if isinstance(Ws, WellMatrix):
        return well_repack(Ws, ell_data)
    out = []
    k0 = 0
    for W in Ws:
        out.append(well_repack(W, ell_data[:, k0:k0 + W.w]))
        k0 += W.w
    return tuple(out)


def build_well(A: sp.spmatrix, dtype=jnp.float32) -> WellMatrix:
    """Structural layout + values of a (pre-ordered!) scipy matrix."""
    A = A.tocsr()
    A.sum_duplicates()
    W = well_layout(A, dtype=dtype)
    counts = np.diff(A.indptr)
    n_pad = W.nb * B_ROWS
    val = np.zeros((n_pad, W.w), dtype=np.float64)
    if A.nnz:
        rows = np.repeat(np.arange(A.shape[0]), counts)
        offs = np.arange(A.nnz) - np.repeat(A.indptr[:-1], counts)
        val[rows, offs] = A.data
    return WellMatrix(
        rb=W.rb, hb=W.hb, hi=W.hi, lo=W.lo,
        dat=jnp.asarray(_host_pack(val, W.nb, W.w), dtype=dtype),
        n_rows=W.n_rows, n_cols=W.n_cols, w=W.w, H=W.H, XR=W.XR,
    )


def build_well_sliced(
    A: sp.spmatrix, dtype=jnp.float32, hs: int = 32
) -> tuple:
    """Split a (pre-ordered!) matrix into window-band slices of <= hs
    sublane rows each and pack every band as its own WellMatrix.

    The kernel's cost per element is ~2*H tile-ops where H is the SHARED
    block window span; banding + per-row slot compaction gives every
    element a window of at most hs rows instead, which is both faster
    (e.g. the depth-9 icosphere PT lv1: H=200 -> 7 slices of <=40) and
    keeps each unrolled body far below the Mosaic scoped-VMEM compile
    cap. Use for operators with STATIC values (P/PT, one-shot A levels);
    value-refreshed operators need the unsliced layout for the
    pure-reshape well_repack."""
    A = A.tocsr()
    A.sum_duplicates()
    n, m = A.shape
    counts = np.diff(A.indptr)
    rows = np.repeat(np.arange(n), counts)
    cols = A.indices
    blk = rows // B_ROWS
    nb = max(-(-n // B_ROWS), 1)
    # per-block aligned window start (same convention as well_layout)
    rb_blk = np.zeros(nb, dtype=np.int64)
    if cols.size:
        first = np.searchsorted(blk, np.arange(nb))
        last = np.searchsorted(blk, np.arange(nb), side="right")
        for b in range(nb):
            if last[b] > first[b]:
                rb_blk[b] = cols[first[b]:last[b]].min() // LANE // 8 * 8
    hi = cols // LANE - rb_blk[blk]
    band = hi // hs
    out = []
    for sband in range(int(band.max(initial=0)) + 1):
        mask = band == sband
        if not mask.any():
            continue
        Asl = sp.coo_matrix(
            (A.data[mask], (rows[mask], cols[mask])), shape=(n, m)
        ).tocsr()
        out.append(build_well(Asl, dtype=dtype))
    if not out:
        out.append(build_well(A, dtype=dtype))
    return tuple(out)


def any_spmv(A, x: jnp.ndarray) -> jnp.ndarray:
    """SpMV dispatch: WellMatrix (or a tuple of band slices) -> Pallas
    kernel, ELLMatrix -> XLA gather.

    Multi-column x batches all C columns through ONE kernel call (the
    select chain's one-hot masks are column-independent and shared;
    see well_spmv_planes) — the multi-RHS shape of the MCF solve,
    reference src/min_quad_with_fixed_mg.cpp:363-373."""
    if isinstance(A, tuple):
        if isinstance(A[0], WellMatrix) and x.ndim == 2 and x.shape[1] > 1:
            return well_apply(A, x.T).T
        y = any_spmv(A[0], x)
        for Wi in A[1:]:
            y = y + any_spmv(Wi, x)
        return y
    if isinstance(A, WellMatrix):
        if x.ndim == 1:
            return well_spmv(A, x)
        if x.shape[1] == 1:
            return well_spmv(A, x[:, 0])[:, None]
        return well_apply(A, x.T).T
    from surface_multigrid_code_tpu.ops.sparse import ell_spmv

    return ell_spmv(A, x)


def _as_tiles(v: jnp.ndarray, nb: int) -> jnp.ndarray:
    """Flat [n] (n <= nb*B_ROWS, zero-padded semantics) or already-tiled
    [nb*SUB, LANE] -> row tiles [nb*SUB, LANE]."""
    if v.ndim == 2:
        return v
    if v.shape[0] == nb * B_ROWS:
        return v.reshape(nb * SUB, LANE)
    out = jnp.zeros((nb * B_ROWS,), dtype=v.dtype)
    out = jax.lax.dynamic_update_slice(out, v, (0,))
    return out.reshape(nb * SUB, LANE)


# fused epilogues applied to the SpMV accumulator inside the kernel
# (operand row-tiles stream as ordinary blocked inputs):
#   axpby:        y = u + (b - (Ax + acc)) * s * escale   ops=(u, b, s)
#   resid:        y = b - (Ax + acc)                      ops=(b,)
#   add:          y = u + (Ax + acc)                      ops=(u,)
#   resid_scaled: y = (b - (Ax + acc)) * s * escale       ops=(b, s)
_EPI_NOPS = {None: 0, "axpby": 3, "resid": 1, "add": 1, "resid_scaled": 2}
# operand kinds in PLANES (multi-column) mode: "p" operands carry one
# plane per column ([C, n]: u, b), "s" operands are column-shared ([n]:
# the diag-scale s, which is the same for every RHS column)
_EPI_KINDS = {
    None: (), "axpby": ("p", "p", "s"), "resid": ("p",), "add": ("p",),
    "resid_scaled": ("p", "s"),
}
# block3 kernels: the diag-scale s is the 3x3 block-diagonal inverse,
# one plane per component ([3, npad] dinv_p, solver/bsr.py) — a "p"
# operand, unlike the scalar/multi-RHS kernels' column-shared "s"
_EPI_KINDS_B3 = {
    None: (), "axpby": ("p", "p", "p"), "resid": ("p",), "add": ("p",),
    "resid_scaled": ("p", "p"),
}


def _apply_epi(acc, ex, epi, escale, y_ref):
    """Shared kernel epilogue; ex = (acc_ref?, *operand_refs)."""
    n_ops = _EPI_NOPS[epi]
    if len(ex) > n_ops:                       # leading acc input
        acc = acc + ex[0][:, :]
        ex = ex[1:]
    if epi is None:
        out = acc
    elif epi == "axpby":
        u, b, s = (r[:, :] for r in ex)
        out = u + (b - acc) * (s * escale)
    elif epi == "resid":
        out = ex[0][:, :] - acc
    elif epi == "add":
        out = ex[0][:, :] + acc
    elif epi == "resid_scaled":
        b, s = (r[:, :] for r in ex)
        out = (b - acc) * (s * escale)
    else:  # pragma: no cover
        raise ValueError(f"unknown epilogue {epi!r}")
    y_ref[:, :] = out


def _body_cost(W: WellMatrix) -> int:
    """Unrolled select-chain length of one kernel body — the quantity the
    _UNROLL_CAP group splitting bounds at build time (sum of per-tap
    spans/candidate counts, or w*H for the legacy whole-window mode)."""
    if W.ht is not None:
        return int(sum(W.ht))
    return W.w * W.H


def _plane_tiles(v: jnp.ndarray, nb: int) -> jnp.ndarray:
    """Planes [C, n] (zero-padded semantics) or already-tiled
    [C, nb*SUB, LANE] -> plane row tiles [C, nb*SUB, LANE]."""
    if v.ndim == 3:
        return v
    if v.shape[1] != nb * B_ROWS:
        out = jnp.zeros((v.shape[0], nb * B_ROWS), dtype=v.dtype)
        v = jax.lax.dynamic_update_slice(out, v, (0, 0))
    return v.reshape(v.shape[0], nb * SUB, LANE)


def well_apply(
    Ws, x: jnp.ndarray, epi: str | None = None, b=None, u=None, s=None,
    escale: float = 1.0, unpadded: bool = True,
) -> jnp.ndarray:
    """Fused windowed SpMV + epilogue over a WellMatrix or tuple of slot/
    band groups. Partial group sums chain through the kernel's acc input;
    the epilogue (see _apply_epi) runs in the LAST group's kernel, so a
    whole smoother update is ONE Pallas call per group with no XLA
    elementwise ops between.

    1-D x: b/u/s may be flat [n] (zero-padded into tiles) or pre-tiled
    [nb*SUB, LANE]. 2-D x: PLANES mode, x is [C, n] (one row per RHS
    column); b/u are planes [C, n] (or [C, nb*SUB, LANE] tiles) while s
    stays column-shared flat [n]; returns planes [C, n_rows]. s must be
    zero-padded past the logical rows so padded rows stay zero."""
    Ws = Ws if isinstance(Ws, tuple) else (Ws,)
    nb = Ws[0].nb
    operands = {
        None: (), "axpby": (u, b, s), "resid": (b,), "add": (u,),
        "resid_scaled": (b, s),
    }[epi]
    if x.ndim == 2:
        C = x.shape[0]
        if any(C * _body_cost(W) > 2 * _UNROLL_CAP for W in Ws):
            # Mosaic's scoped-VMEM compile budget bounds the unrolled
            # kernel body, and a C-column body is ~C x the single-column
            # one (measured: C=3 at body 4096 allocates 17.7M vs the 16M
            # limit). Layouts built without a multi-column cap hint
            # (ops built via build_well_auto(cap=_UNROLL_CAP // ncols))
            # fall back to per-column calls on such hub-row operators.
            kinds = _EPI_KINDS[epi]

            def col_operand(v, k, c):
                return v if k == "s" or v is None else v[c]

            cols = []
            for c in range(C):
                kw = dict(zip(("u", "b", "s"), (None, None, None)))
                named = {"axpby": ("u", "b", "s"), "resid": ("b",),
                         "add": ("u",), "resid_scaled": ("b", "s"),
                         None: ()}[epi]
                for name, v, k in zip(named, operands, kinds):
                    kw[name] = col_operand(v, k, c)
                cols.append(well_apply(
                    Ws, x[c], epi=epi, escale=escale, unpadded=unpadded,
                    **{k: v for k, v in kw.items() if v is not None},
                ))
            return jnp.stack(cols, axis=0)
        kinds = _EPI_KINDS[epi]
        ops = tuple(
            _plane_tiles(v, nb) if k == "p" else _as_tiles(v, nb)
            for v, k in zip(operands, kinds)
        )
        acc = None
        for W in Ws[:-1]:
            acc = well_spmv_planes(W, x, unpadded=False, acc=acc)
        return well_spmv_planes(
            Ws[-1], x, unpadded=unpadded, epi=epi, escale=escale, acc=acc,
            ops=ops,
        )
    ops = tuple(_as_tiles(v, nb) for v in operands)
    acc = None
    for W in Ws[:-1]:
        acc = well_spmv(W, x, unpadded=False, acc=acc)
    return well_spmv(
        Ws[-1], x, unpadded=unpadded, epi=epi, escale=escale, acc=acc,
        ops=ops,
    )


def _x64_kernel_guard(dtype):
    """32-bit trace context for f32 kernels under global x64.

    With jax_enable_x64 on (the ex04 iterative-refinement policy), jnp
    index helpers inside the kernel trace (take_along_axis iotas etc.)
    default to int64, which Mosaic lowers through a recursive 64-bit
    emulation deep enough to overflow Python 3.12's (uncontrollable)
    C-recursion cap — every kernel compile dies with RecursionError.
    f32 kernels trace in 32-bit mode instead; f64 (CPU) kernels are
    untouched (the guard would downcast their explicit f64 asks), and
    CPU backends skip the guard entirely (interpret mode handles int64,
    and flipping the x64 config inside traces forces retraces that
    noticeably slow the CPU test suite)."""
    import contextlib

    if (
        jax.config.jax_enable_x64
        and dtype != jnp.float64
        and jax.default_backend() != "cpu"
    ):
        return jax.enable_x64(False)
    return contextlib.nullcontext()


@partial(jax.jit, static_argnames=("unpadded", "interpret", "epi", "escale"))
def well_spmv(W: WellMatrix, x: jnp.ndarray, unpadded: bool = True,
              interpret: bool = False, epi: str | None = None,
              escale: float = 1.0, acc=None, ops: tuple = ()):
    """y = epilogue(A @ x (+ acc)) via the windowed Pallas kernel.

    x: [n_cols] flat (or [nb_x*B_ROWS] zero-tail padded). acc: optional
    [nb*B_ROWS] flat or [nb*SUB, LANE] partial sum added to A@x. ops:
    epilogue operand row-tiles (see _apply_epi)."""
    with _x64_kernel_guard(W.dat.dtype):
        return _well_spmv_impl(
            W, x, unpadded, interpret, epi, escale, acc, ops
        )


def _well_spmv_impl(W: WellMatrix, x: jnp.ndarray, unpadded: bool,
                    interpret: bool, epi: str | None,
                    escale: float, acc, ops: tuple):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # CPU backends (tests, dryruns) run the kernel interpreted — the
    # compiled Mosaic path is TPU-only.
    interpret = interpret or jax.default_backend() == "cpu"

    nb, w, H, XR = W.nb, W.w, W.H, W.XR
    if W.xpad == 0 and x.ndim == 1 and x.shape[0] == XR * LANE:
        # padded-flow fast path: x is already the kernel's x space with a
        # zero tail (tiled V-cycle vectors) — pure reshape, no copy
        x2d = x.astype(W.dat.dtype).reshape(XR, LANE)
    else:
        x_pad = jnp.zeros((XR * LANE,), dtype=W.dat.dtype)
        x_pad = jax.lax.dynamic_update_slice(
            x_pad, x.astype(W.dat.dtype), (W.xpad * B_ROWS,)
        )
        x2d = x_pad.reshape(XR, LANE)

    ex_in = ()
    if acc is not None:
        ex_in += (_as_tiles(acc, nb).astype(W.dat.dtype),)
    ex_in += tuple(t.astype(W.dat.dtype) for t in ops)
    n_ex = len(ex_in)

    if W.q is not None and W.q[1] == 1 and W.q[0] > 1:
        # phase-split integer-slope mode (build_well_diaq): x is viewed
        # as qn phase planes (plane p = sublane rows ≡ p mod qn, one XLA
        # transpose per call); candidate dd = p + qn*j reads a CONTIGUOUS
        # 8-row slice of plane p at STATIC offset j within the
        # per-(block,tap) window (one prefetched tile offset).
        qn = W.q[0]
        AL = SUB * qn
        D = W.ht
        Tq = [(-(-D[k] // qn) + 14) // 8 for k in range(w)]
        Hp8 = H // AL
        XRq8 = XR // AL
        xq = (
            x2d.reshape(XRq8 * SUB, qn, LANE)
            .transpose(1, 0, 2)
            .reshape(qn, XRq8, SUB, LANE)
        )

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((w * SUB, LANE), lambda b, rb, ob: (b, 0)),
                pl.BlockSpec((w * SUB, LANE), lambda b, rb, ob: (b, 0)),
                pl.BlockSpec((w * SUB, LANE), lambda b, rb, ob: (b, 0)),
            ] + [
                pl.BlockSpec((SUB, LANE), lambda b, rb, ob: (b, 0))
                for _ in range(n_ex)
            ] + [
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((SUB, LANE), lambda b, rb, ob: (b, 0)),
            scratch_shapes=[
                pltpu.VMEM((qn, Hp8, SUB, LANE), W.dat.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        )

        def diaq_kernel(*refs):
            rb_ref, ob_ref, hi_ref, lo_ref, dat_ref = refs[:5]
            ex = refs[5:5 + n_ex]
            x_hbm, y_ref, win, sem = refs[5 + n_ex:]
            b = pl.program_id(0)
            rbt = rb_ref[b]
            cp = pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(rbt, Hp8), :, :], win, sem
            )
            cp.start()
            cp.wait()
            acc = jnp.zeros((SUB, LANE), dtype=y_ref.dtype)
            for k in range(w):
                otq = ob_ref[b * w + k]
                ddk = hi_ref[k * SUB:(k + 1) * SUB, :]
                lok = lo_ref[k * SUB:(k + 1) * SUB, :]
                datk = dat_ref[k * SUB:(k + 1) * SUB, :]
                g = jnp.zeros((SUB, LANE), dtype=x_hbm.dtype)
                for p in range(qn):
                    nj = -(-(D[k] - p) // qn)
                    if nj <= 0:
                        continue
                    V2 = win[p, pl.ds(otq, Tq[k]), :, :].reshape(
                        Tq[k] * SUB, LANE
                    )
                    for j in range(nj):
                        tile = jax.lax.slice(V2, (j, 0), (j + SUB, LANE))
                        t = jnp.take_along_axis(tile, lok, axis=1)
                        g = jnp.where(ddk == p + qn * j, t, g)
                acc = acc + datk * g
            _apply_epi(acc, ex, epi, escale, y_ref)

        y2d = pl.pallas_call(
            diaq_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb * SUB, LANE), W.dat.dtype),
            interpret=interpret,
        )(W.rb, W.ob, W.hi, W.lo, W.dat, *ex_in, xq)
        y = y2d.reshape(-1)
        return y[: W.n_rows] if unpadded else y

    if W.q is not None:
        # diagonal mode: candidates are diagonal offsets d; sublane s of
        # an output tile reads window row floor(q*s) + d — a STATIC
        # (strided / repeated) 8-row pattern of the loaded window per
        # candidate, so the chain runs ~span/8 iterations instead of span.
        qn, qd = W.q
        D = W.ht
        qf7 = (qn * (SUB - 1)) // qd
        T = [(D[k] - 1 + qf7) // 8 + 1 for k in range(w)]
        H8 = H // SUB
        XR8 = XR // SUB
        x3d = x2d.reshape(XR8, SUB, LANE)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((w * SUB, LANE), lambda b, rb, ob: (b, 0)),
                pl.BlockSpec((w * SUB, LANE), lambda b, rb, ob: (b, 0)),
                pl.BlockSpec((w * SUB, LANE), lambda b, rb, ob: (b, 0)),
            ] + [
                pl.BlockSpec((SUB, LANE), lambda b, rb, ob: (b, 0))
                for _ in range(n_ex)
            ] + [
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((SUB, LANE), lambda b, rb, ob: (b, 0)),
            scratch_shapes=[
                pltpu.VMEM((H8, SUB, LANE), W.dat.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        )

        def dia_kernel(*refs):
            rb_ref, ob_ref, hi_ref, lo_ref, dat_ref = refs[:5]
            ex = refs[5:5 + n_ex]
            x_hbm, y_ref, win, sem = refs[5 + n_ex:]
            b = pl.program_id(0)
            rb0t = rb_ref[b] // SUB
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(rb0t, H8), :, :], win, sem
            )
            cp.start()
            cp.wait()
            acc = jnp.zeros((SUB, LANE), dtype=y_ref.dtype)
            for k in range(w):
                ot = ob_ref[b * w + k]
                ddk = hi_ref[k * SUB:(k + 1) * SUB, :]
                lok = lo_ref[k * SUB:(k + 1) * SUB, :]
                datk = dat_ref[k * SUB:(k + 1) * SUB, :]
                V2 = win[pl.ds(ot, T[k]), :, :].reshape(T[k] * SUB, LANE)
                g = jnp.zeros((SUB, LANE), dtype=x_hbm.dtype)
                for d in range(D[k]):
                    if qd == 1:
                        tile_d = jax.lax.slice(
                            V2, (d, 0), (d + (SUB - 1) * qn + 1, LANE),
                            (qn, 1),
                        )
                    else:
                        parts = []
                        j, srow = 0, 0
                        while srow < SUB:
                            cnt = min(qd, SUB - srow)
                            parts.append(jnp.broadcast_to(
                                V2[d + j:d + j + 1, :], (cnt, LANE)))
                            j += 1
                            srow += cnt
                        tile_d = jnp.concatenate(parts, axis=0)
                    t = jnp.take_along_axis(tile_d, lok, axis=1)
                    g = jnp.where(ddk == d, t, g)
                acc = acc + datk * g
            _apply_epi(acc, ex, epi, escale, y_ref)

        y2d = pl.pallas_call(
            dia_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb * SUB, LANE), W.dat.dtype),
            interpret=interpret,
        )(W.rb, W.ob, W.hi, W.lo, W.dat, *ex_in, x3d)
        y = y2d.reshape(-1)
        return y[: W.n_rows] if unpadded else y

    if W.ht is not None:
        # tap-recentered mode: per-(block,tap) window starts (scalar
        # prefetch), per-tap static spans ht[k] — the select chain runs
        # sum_k ht[k] iterations instead of w*H. The window scratch is
        # (H/8, 8, LANE) and per-tap starts are sliced on the LEADING
        # (tile) dim only — all offsets are 8-aligned, so Mosaic lowers
        # the dynamic start to address arithmetic, not sublane shuffles.
        ht = W.ht
        H8 = H // SUB
        XR8 = XR // SUB
        x3d = x2d.reshape(XR8, SUB, LANE)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((w * SUB, LANE), lambda b, rb, ob: (b, 0)),
                pl.BlockSpec((w * SUB, LANE), lambda b, rb, ob: (b, 0)),
                pl.BlockSpec((w * SUB, LANE), lambda b, rb, ob: (b, 0)),
            ] + [
                pl.BlockSpec((SUB, LANE), lambda b, rb, ob: (b, 0))
                for _ in range(n_ex)
            ] + [
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((SUB, LANE), lambda b, rb, ob: (b, 0)),
            scratch_shapes=[
                pltpu.VMEM((H8, SUB, LANE), W.dat.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        )

        def tap_kernel(*refs):
            rb_ref, ob_ref, hi_ref, lo_ref, dat_ref = refs[:5]
            ex = refs[5:5 + n_ex]
            x_hbm, y_ref, win, sem = refs[5 + n_ex:]
            b = pl.program_id(0)
            rb0 = rb_ref[b] // SUB
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(rb0, H8), :, :], win, sem
            )
            cp.start()
            cp.wait()
            acc = jnp.zeros((SUB, LANE), dtype=y_ref.dtype)
            for k in range(w):
                o = ob_ref[b * w + k] // SUB
                hik = hi_ref[k * SUB:(k + 1) * SUB, :]
                lok = lo_ref[k * SUB:(k + 1) * SUB, :]
                datk = dat_ref[k * SUB:(k + 1) * SUB, :]
                sub = win[pl.ds(o, ht[k] // SUB), :, :]
                g = jnp.zeros((SUB, LANE), dtype=x_hbm.dtype)
                for h in range(ht[k]):
                    row_b = jnp.broadcast_to(
                        sub[h // SUB, h % SUB].reshape(1, LANE),
                        (SUB, LANE),
                    )
                    t = jnp.take_along_axis(row_b, lok, axis=1)
                    g = jnp.where(hik == h, t, g)
                acc = acc + datk * g
            _apply_epi(acc, ex, epi, escale, y_ref)

        y2d = pl.pallas_call(
            tap_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb * SUB, LANE), W.dat.dtype),
            interpret=interpret,
        )(W.rb, W.ob, W.hi, W.lo, W.dat, *ex_in, x3d)
        y = y2d.reshape(-1)
        return y[: W.n_rows] if unpadded else y

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((w * SUB, LANE), lambda b, rb, hb: (b, 0)),
            pl.BlockSpec((w * SUB, LANE), lambda b, rb, hb: (b, 0)),
            pl.BlockSpec((w * SUB, LANE), lambda b, rb, hb: (b, 0)),
        ] + [
            pl.BlockSpec((SUB, LANE), lambda b, rb, hb: (b, 0))
            for _ in range(n_ex)
        ] + [
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((SUB, LANE), lambda b, rb, hb: (b, 0)),
        scratch_shapes=[
            pltpu.VMEM((H, LANE), W.dat.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    # Two kernel bodies sharing the window-DMA prologue. The fully
    # unrolled form is ~27x faster at runtime (no loop control, static
    # window-row reads) but its compile-time scoped-VMEM cost grows with
    # w*H — a pathological operator (e.g. a 171-wide PT row hub on ogre's
    # constrained hierarchy) blows the 16 MB scoped-vmem limit. Such
    # operators take the fori_loop form with the PER-BLOCK span as a
    # dynamic bound instead.
    unrolled = w * H <= _UNROLL_CAP

    def kernel(*refs):
        rb_ref, hb_ref, hi_ref, lo_ref, dat_ref = refs[:5]
        ex = refs[5:5 + n_ex]
        x_hbm, y_ref, win, sem = refs[5 + n_ex:]
        b = pl.program_id(0)
        rb0 = rb_ref[b]
        span = hb_ref[b]
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(rb0, H), :], win, sem)
        cp.start()
        cp.wait()
        acc = jnp.zeros((SUB, LANE), dtype=y_ref.dtype)
        for k in range(w):
            hik = hi_ref[k * SUB:(k + 1) * SUB, :]
            lok = lo_ref[k * SUB:(k + 1) * SUB, :]
            datk = dat_ref[k * SUB:(k + 1) * SUB, :]
            if unrolled:
                g = jnp.zeros((SUB, LANE), dtype=x_hbm.dtype)
                for h in range(H):
                    row_b = jnp.broadcast_to(
                        win[h, :].reshape(1, LANE), (SUB, LANE)
                    )
                    t = jnp.take_along_axis(row_b, lok, axis=1)
                    g = jnp.where(hik == h, t, g)
            else:
                def h_step(h, g, hik=hik, lok=lok):
                    row_b = jnp.broadcast_to(
                        win[pl.ds(h, 1), :], (SUB, LANE)
                    )
                    t = jnp.take_along_axis(row_b, lok, axis=1)
                    return jnp.where(hik == h, t, g)

                g = jax.lax.fori_loop(
                    0, span, h_step,
                    jnp.zeros((SUB, LANE), dtype=x_hbm.dtype),
                )
            acc = acc + datk * g
        _apply_epi(acc, ex, epi, escale, y_ref)

    y2d = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * SUB, LANE), W.dat.dtype),
        interpret=interpret,
    )(W.rb, W.hb, W.hi, W.lo, W.dat, *ex_in, x2d)
    y = y2d.reshape(-1)
    return y[: W.n_rows] if unpadded else y


@partial(jax.jit, static_argnames=("unpadded", "interpret", "epi", "escale"))
def well_spmv_block3(
    W: WellMatrix, xp: jnp.ndarray, dats: tuple,
    unpadded: bool = True, interpret: bool = False, acc=None,
    epi: str | None = None, escale: float = 1.0, ops: tuple = (),
):
    """3x3-BLOCK windowed SpMV: y[i] = sum_j A_ij @ x[j] for a vertex-graph
    operator whose values are 3x3 blocks (the BSR balloon Hessian,
    solver/bsr.py) — one kernel resolves the shared select chain once and
    contracts all 9 block components against the 3 input planes.

    W: structural layout of the VERTEX-graph pattern (dat ignored).
    xp: planes [3, n_cols].  dats: 9 packed dat arrays (well_repack_tap
    outputs' dat leaves, row-major ij order) matching W's group layout.
    Returns planes [3, n_rows].  acc: optional [3, nb*B_ROWS] partials.

    Why: the XLA row-gather BSR SpMV costs ~0.75 ns/element (bunny_15K
    finest: 0.43 ms) — better than the serial scalar path but still
    gather-bound; the select chain shares its one-hot masks across the 3
    planes and 9 components (~10 VPU ops/chain-row + 18 FMA/tap vs the
    scalar kernel's 4 + 2).  Tap/dia(q=1)/legacy layouts supported (the
    vertex graphs build_well_auto produces); phase-split integer slopes
    are not (square operators never pick them).

    epi/escale/ops: fused smoother epilogue applied to the accumulator
    in-kernel (see _apply_epi_planes); operand kinds follow
    _EPI_KINDS_B3 (the diag scale is a [3, npad] plane here).  ops are
    pre-tiled [3, nb*SUB, LANE] row tiles."""
    with _x64_kernel_guard(dats[0].dtype):
        return _well_spmv_block3_impl(
            W, xp, dats, unpadded, interpret, acc, epi, escale, ops
        )


def _well_spmv_block3_impl(W: WellMatrix, xp: jnp.ndarray, dats: tuple,
                           unpadded: bool, interpret: bool, acc,
                           epi: str | None = None, escale: float = 1.0,
                           ops: tuple = ()):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = interpret or jax.default_backend() == "cpu"
    nb, w, H, XR = W.nb, W.w, W.H, W.XR
    C = 3
    assert xp.shape[0] == C and len(dats) == 9
    if W.q is not None and W.q[1] == 1 and W.q[0] > 1:
        raise NotImplementedError("block3 kernel: phase-split layouts")
    if W.xpad == 0 and xp.shape[1] == XR * LANE:
        x2d = xp.astype(dats[0].dtype).reshape(C, XR, LANE)
    else:
        x_pad = jnp.zeros((C, XR * LANE), dtype=dats[0].dtype)
        x_pad = jax.lax.dynamic_update_slice(
            x_pad, xp.astype(dats[0].dtype), (0, W.xpad * B_ROWS)
        )
        x2d = x_pad.reshape(C, XR, LANE)

    ex_in = ()
    ex_kinds = ()
    has_acc = acc is not None
    if acc is not None:
        ex_in += (_plane_tiles(acc, nb).astype(dats[0].dtype),)
        ex_kinds += ("p",)
    ex_in += tuple(t.astype(dats[0].dtype) for t in ops)
    ex_kinds += _EPI_KINDS_B3[epi]
    n_ex = len(ex_in)

    mat_spec = pl.BlockSpec((w * SUB, LANE), lambda b, *pf: (b, 0))
    ex_specs = [
        pl.BlockSpec((C, SUB, LANE), lambda b, *pf: (0, b, 0))
        if k == "p"
        else pl.BlockSpec((SUB, LANE), lambda b, *pf: (b, 0))
        for k in ex_kinds
    ]
    out_spec = pl.BlockSpec((C, SUB, LANE), lambda b, *pf: (0, b, 0))
    out_shape = jax.ShapeDtypeStruct((C, nb * SUB, LANE), dats[0].dtype)

    def finish(y3d):
        y = y3d.reshape(C, nb * B_ROWS)
        return y[:, : W.n_rows] if unpadded else y

    def contract(accs, gs, dat_refs, k):
        # accs[i] += sum_j dat_ij * g_j
        out = []
        for i in range(3):
            a = accs[i]
            for j in range(3):
                dk = dat_refs[3 * i + j][k * SUB:(k + 1) * SUB, :]
                a = a + dk * gs[j]
            out.append(a)
        return out

    if W.ht is not None and W.q is None:
        # tap-recentered mode
        ht = W.ht
        H8 = H // SUB
        x4d = x2d.reshape(C, XR // SUB, SUB, LANE)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb,),
            in_specs=[mat_spec, mat_spec]
            + [mat_spec] * 9
            + ex_specs
            + [pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((C, H8, SUB, LANE), dats[0].dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        )

        def tap_kernel(*refs):
            rb_ref, ob_ref, hi_ref, lo_ref = refs[:4]
            dat_refs = refs[4:13]
            ex = refs[13:13 + n_ex]
            x_hbm, y_ref, win, sem = refs[13 + n_ex:]
            b = pl.program_id(0)
            rb0 = rb_ref[b] // SUB
            cp = pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(rb0, H8), :, :], win, sem
            )
            cp.start()
            cp.wait()
            accs = [
                jnp.zeros((SUB, LANE), dtype=y_ref.dtype) for _ in range(3)
            ]
            for k in range(w):
                o = ob_ref[b * w + k] // SUB
                hik = hi_ref[k * SUB:(k + 1) * SUB, :]
                lok = lo_ref[k * SUB:(k + 1) * SUB, :]
                subs = [
                    win[c, pl.ds(o, ht[k] // SUB), :, :] for c in range(3)
                ]
                gs = [
                    jnp.zeros((SUB, LANE), dtype=x_hbm.dtype)
                    for _ in range(3)
                ]
                for h in range(ht[k]):
                    mask = hik == h
                    for c in range(3):
                        row_b = jnp.broadcast_to(
                            subs[c][h // SUB, h % SUB].reshape(1, LANE),
                            (SUB, LANE),
                        )
                        t = jnp.take_along_axis(row_b, lok, axis=1)
                        gs[c] = jnp.where(mask, t, gs[c])
                accs = contract(accs, gs, dat_refs, k)
            _apply_epi_planes(accs, ex, ex_kinds, epi, escale, y_ref, has_acc)

        y3d = pl.pallas_call(
            tap_kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(W.rb, W.ob, W.hi, W.lo, *dats, *ex_in, x4d)
        return finish(y3d)

    if W.q is not None:
        # slope-1 / fractional diagonal mode
        qn, qd = W.q
        D = W.ht
        qf7 = (qn * (SUB - 1)) // qd
        T = [(D[k] - 1 + qf7) // 8 + 1 for k in range(w)]
        H8 = H // SUB
        x4d = x2d.reshape(C, XR // SUB, SUB, LANE)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb,),
            in_specs=[mat_spec, mat_spec]
            + [mat_spec] * 9
            + ex_specs
            + [pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((C, H8, SUB, LANE), dats[0].dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        )

        def dia_kernel(*refs):
            rb_ref, ob_ref, hi_ref, lo_ref = refs[:4]
            dat_refs = refs[4:13]
            ex = refs[13:13 + n_ex]
            x_hbm, y_ref, win, sem = refs[13 + n_ex:]
            b = pl.program_id(0)
            rb0t = rb_ref[b] // SUB
            cp = pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(rb0t, H8), :, :], win, sem
            )
            cp.start()
            cp.wait()
            accs = [
                jnp.zeros((SUB, LANE), dtype=y_ref.dtype) for _ in range(3)
            ]
            for k in range(w):
                ot = ob_ref[b * w + k]
                ddk = hi_ref[k * SUB:(k + 1) * SUB, :]
                lok = lo_ref[k * SUB:(k + 1) * SUB, :]
                V2s = [
                    win[c, pl.ds(ot, T[k]), :, :].reshape(T[k] * SUB, LANE)
                    for c in range(3)
                ]
                gs = [
                    jnp.zeros((SUB, LANE), dtype=x_hbm.dtype)
                    for _ in range(3)
                ]
                for d in range(D[k]):
                    mask = ddk == d
                    for c in range(3):
                        if qd == 1:
                            tile_d = jax.lax.slice(
                                V2s[c], (d, 0),
                                (d + (SUB - 1) * qn + 1, LANE), (qn, 1),
                            )
                        else:
                            parts = []
                            jj, srow = 0, 0
                            while srow < SUB:
                                cnt = min(qd, SUB - srow)
                                parts.append(jnp.broadcast_to(
                                    V2s[c][d + jj:d + jj + 1, :],
                                    (cnt, LANE)))
                                jj += 1
                                srow += cnt
                            tile_d = jnp.concatenate(parts, axis=0)
                        t = jnp.take_along_axis(tile_d, lok, axis=1)
                        gs[c] = jnp.where(mask, t, gs[c])
                accs = contract(accs, gs, dat_refs, k)
            _apply_epi_planes(accs, ex, ex_kinds, epi, escale, y_ref, has_acc)

        y3d = pl.pallas_call(
            dia_kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(W.rb, W.ob, W.hi, W.lo, *dats, *ex_in, x4d)
        return finish(y3d)

    # legacy whole-window mode
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[mat_spec, mat_spec]
        + [mat_spec] * 9
        + ex_specs
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((C, H, LANE), dats[0].dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    unrolled = w * H <= _UNROLL_CAP

    def kernel(*refs):
        rb_ref, hb_ref, hi_ref, lo_ref = refs[:4]
        dat_refs = refs[4:13]
        ex = refs[13:13 + n_ex]
        x_hbm, y_ref, win, sem = refs[13 + n_ex:]
        b = pl.program_id(0)
        rb0 = rb_ref[b]
        span = hb_ref[b]
        cp = pltpu.make_async_copy(x_hbm.at[:, pl.ds(rb0, H), :], win, sem)
        cp.start()
        cp.wait()
        accs = [
            jnp.zeros((SUB, LANE), dtype=y_ref.dtype) for _ in range(3)
        ]
        for k in range(w):
            hik = hi_ref[k * SUB:(k + 1) * SUB, :]
            lok = lo_ref[k * SUB:(k + 1) * SUB, :]
            if unrolled:
                gs = [
                    jnp.zeros((SUB, LANE), dtype=x_hbm.dtype)
                    for _ in range(3)
                ]
                for h in range(H):
                    mask = hik == h
                    for c in range(3):
                        row_b = jnp.broadcast_to(
                            win[c, h, :].reshape(1, LANE), (SUB, LANE)
                        )
                        t = jnp.take_along_axis(row_b, lok, axis=1)
                        gs[c] = jnp.where(mask, t, gs[c])
            else:
                def h_step(h, gs, hik=hik, lok=lok):
                    mask = hik == h
                    out = []
                    for c in range(3):
                        row_b = jnp.broadcast_to(
                            win[c, pl.ds(h, 1), :], (SUB, LANE)
                        )
                        t = jnp.take_along_axis(row_b, lok, axis=1)
                        out.append(jnp.where(mask, t, gs[c]))
                    return tuple(out)

                gs = list(jax.lax.fori_loop(
                    0, span, h_step,
                    tuple(
                        jnp.zeros((SUB, LANE), dtype=x_hbm.dtype)
                        for _ in range(3)
                    ),
                ))
            accs = contract(accs, gs, dat_refs, k)
        _apply_epi_planes(accs, ex, ex_kinds, epi, escale, y_ref, has_acc)

    y3d = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(W.rb, W.hb, W.hi, W.lo, *dats, *ex_in, x2d)
    return finish(y3d)


def well_block3_apply(Ws, xp: jnp.ndarray, dats_groups, acc=None,
                      epi: str | None = None, b=None, u=None, s=None,
                      escale: float = 1.0):
    """Block SpMV + fused epilogue over a WellMatrix or tuple of slot
    groups: dats_groups is a tuple (per group) of 9-tuples of packed dat
    arrays.  Partial group sums chain through acc; the epilogue runs in
    the LAST group's kernel (as well_apply does for the scalar path), so
    a whole block-smoother update is one Pallas call per group with no
    XLA elementwise ops between.  b/u/s are planes [3, npad] (s = the
    per-component diag scale dinv_p; traced scalars fold into s)."""
    Ws = Ws if isinstance(Ws, tuple) else (Ws,)
    dats_groups = (
        dats_groups if isinstance(dats_groups[0], tuple) else (dats_groups,)
    )
    nb = Ws[0].nb
    operands = {
        None: (), "axpby": (u, b, s), "resid": (b,), "add": (u,),
        "resid_scaled": (b, s),
    }[epi]
    ops = tuple(_plane_tiles(v, nb) for v in operands)
    y = acc
    for W, dats in zip(Ws[:-1], dats_groups[:-1]):
        y = well_spmv_block3(W, xp, dats, unpadded=False, acc=y)
    return well_spmv_block3(
        Ws[-1], xp, dats_groups[-1], unpadded=False, acc=y,
        epi=epi, escale=escale, ops=ops,
    )


def _apply_epi_planes(accs, ex, ex_kinds, epi, escale, y_ref, has_acc):
    """Planes-mode epilogue: accs is a list of C [SUB, LANE] accumulators;
    ex are the extra operand refs in order, each percol [C, SUB, LANE]
    ("p") or column-shared [SUB, LANE] ("s") per ex_kinds. A leading "p"
    acc input (chained partial sums) is folded in first; has_acc is the
    builder's explicit `acc is not None` (never inferred from arity —
    the scalar and block3 kinds tables only coincidentally agree)."""
    C = len(accs)
    if has_acc:                               # leading percol acc input
        accs = [a + ex[0][c, :, :] for c, a in enumerate(accs)]
        ex = ex[1:]
        ex_kinds = ex_kinds[1:]

    def op(i, c):
        return ex[i][c, :, :] if ex_kinds[i] == "p" else ex[i][:, :]

    for c in range(C):
        acc = accs[c]
        if epi is None:
            out = acc
        elif epi == "axpby":
            out = op(0, c) + (op(1, c) - acc) * (op(2, c) * escale)
        elif epi == "resid":
            out = op(0, c) - acc
        elif epi == "add":
            out = op(0, c) + acc
        elif epi == "resid_scaled":
            out = (op(0, c) - acc) * (op(1, c) * escale)
        else:  # pragma: no cover
            raise ValueError(f"unknown epilogue {epi!r}")
        y_ref[c, :, :] = out


@partial(jax.jit, static_argnames=("unpadded", "interpret", "epi", "escale"))
def well_spmv_planes(
    W: WellMatrix, xp: jnp.ndarray, unpadded: bool = True,
    interpret: bool = False, epi: str | None = None,
    escale: float = 1.0, acc=None, ops: tuple = (),
):
    """Multi-RHS windowed SpMV: y[c] = epilogue(A @ xp[c] (+ acc[c])) for
    all C columns in ONE kernel call (multi-RHS batching; VERDICT round-2
    item 1, reference multi-column solve src/min_quad_with_fixed_mg.cpp:
    363-373).

    xp: planes [C, n_cols] (or [C, XR*LANE] zero-tail padded — the tiled
    V-cycle flow). Returns planes [C, n_rows] ([C, nb*B_ROWS] padded).

    Why one kernel beats C calls: the select chain's sublane one-hot
    masks (hi == h) are column-INDEPENDENT — they are computed once and
    reused across the C takes/selects — and the hi/lo/dat tiles, window
    DMA descriptors and kernel launch are all shared. acc: optional
    [C, nb*B_ROWS] planes (or [C, nb*SUB, LANE] tiles) of partial sums.
    ops: epilogue operands, percol as [C, nb*SUB, LANE], shared as
    [nb*SUB, LANE] (see _EPI_KINDS / well_apply)."""
    with _x64_kernel_guard(W.dat.dtype):
        return _well_spmv_planes_impl(
            W, xp, unpadded, interpret, epi, escale, acc, ops
        )


def _well_spmv_planes_impl(W: WellMatrix, xp: jnp.ndarray, unpadded: bool,
                           interpret: bool, epi: str | None,
                           escale: float, acc, ops: tuple):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = interpret or jax.default_backend() == "cpu"

    nb, w, H, XR = W.nb, W.w, W.H, W.XR
    C = xp.shape[0]
    if W.xpad == 0 and xp.shape[1] == XR * LANE:
        x2d = xp.astype(W.dat.dtype).reshape(C, XR, LANE)
    else:
        x_pad = jnp.zeros((C, XR * LANE), dtype=W.dat.dtype)
        x_pad = jax.lax.dynamic_update_slice(
            x_pad, xp.astype(W.dat.dtype), (0, W.xpad * B_ROWS)
        )
        x2d = x_pad.reshape(C, XR, LANE)

    ex_in = ()
    ex_kinds = ()
    has_acc = acc is not None
    if acc is not None:
        ex_in += (_plane_tiles(acc, nb).astype(W.dat.dtype),)
        ex_kinds += ("p",)
    ex_in += tuple(t.astype(W.dat.dtype) for t in ops)
    ex_kinds += _EPI_KINDS[epi]
    n_ex = len(ex_in)

    def ex_spec(kind):
        if kind == "p":
            return pl.BlockSpec((C, SUB, LANE), lambda b, *pf: (0, b, 0))
        return pl.BlockSpec((SUB, LANE), lambda b, *pf: (b, 0))

    out_spec = pl.BlockSpec((C, SUB, LANE), lambda b, *pf: (0, b, 0))
    out_shape = jax.ShapeDtypeStruct((C, nb * SUB, LANE), W.dat.dtype)
    mat_spec = pl.BlockSpec((w * SUB, LANE), lambda b, *pf: (b, 0))

    def finish(y3d):
        y = y3d.reshape(C, nb * B_ROWS)
        return y[:, : W.n_rows] if unpadded else y

    if W.q is not None and W.q[1] == 1 and W.q[0] > 1:
        # phase-split integer-slope mode: C x qn phase planes folded into
        # one leading scratch dim (plane c*qn + p), same per-candidate
        # static 8-row slices as the single-column diaq kernel.
        qn = W.q[0]
        AL = SUB * qn
        D = W.ht
        Tq = [(-(-D[k] // qn) + 14) // 8 for k in range(w)]
        Hp8 = H // AL
        XRq8 = XR // AL
        xq = (
            x2d.reshape(C, XRq8 * SUB, qn, LANE)
            .transpose(0, 2, 1, 3)
            .reshape(C * qn, XRq8, SUB, LANE)
        )

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb,),
            in_specs=[mat_spec, mat_spec, mat_spec]
            + [ex_spec(k) for k in ex_kinds]
            + [pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((C * qn, Hp8, SUB, LANE), W.dat.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        )

        def diaq_kernel(*refs):
            rb_ref, ob_ref, hi_ref, lo_ref, dat_ref = refs[:5]
            ex = refs[5:5 + n_ex]
            x_hbm, y_ref, win, sem = refs[5 + n_ex:]
            b = pl.program_id(0)
            rbt = rb_ref[b]
            cp = pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(rbt, Hp8), :, :], win, sem
            )
            cp.start()
            cp.wait()
            accs = [
                jnp.zeros((SUB, LANE), dtype=y_ref.dtype) for _ in range(C)
            ]
            for k in range(w):
                otq = ob_ref[b * w + k]
                ddk = hi_ref[k * SUB:(k + 1) * SUB, :]
                lok = lo_ref[k * SUB:(k + 1) * SUB, :]
                datk = dat_ref[k * SUB:(k + 1) * SUB, :]
                gs = [
                    jnp.zeros((SUB, LANE), dtype=x_hbm.dtype)
                    for _ in range(C)
                ]
                for p in range(qn):
                    nj = -(-(D[k] - p) // qn)
                    if nj <= 0:
                        continue
                    V2s = [
                        win[c * qn + p, pl.ds(otq, Tq[k]), :, :].reshape(
                            Tq[k] * SUB, LANE
                        )
                        for c in range(C)
                    ]
                    for j in range(nj):
                        mask = ddk == p + qn * j
                        for c in range(C):
                            tile = jax.lax.slice(
                                V2s[c], (j, 0), (j + SUB, LANE)
                            )
                            t = jnp.take_along_axis(tile, lok, axis=1)
                            gs[c] = jnp.where(mask, t, gs[c])
                accs = [a + datk * g for a, g in zip(accs, gs)]
            _apply_epi_planes(accs, ex, ex_kinds, epi, escale, y_ref, has_acc)

        y3d = pl.pallas_call(
            diaq_kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(W.rb, W.ob, W.hi, W.lo, W.dat, *ex_in, xq)
        return finish(y3d)

    if W.q is not None:
        # diagonal mode, one plane per column
        qn, qd = W.q
        D = W.ht
        qf7 = (qn * (SUB - 1)) // qd
        T = [(D[k] - 1 + qf7) // 8 + 1 for k in range(w)]
        H8 = H // SUB
        XR8 = XR // SUB
        x4d = x2d.reshape(C, XR8, SUB, LANE)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb,),
            in_specs=[mat_spec, mat_spec, mat_spec]
            + [ex_spec(k) for k in ex_kinds]
            + [pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((C, H8, SUB, LANE), W.dat.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        )

        def dia_kernel(*refs):
            rb_ref, ob_ref, hi_ref, lo_ref, dat_ref = refs[:5]
            ex = refs[5:5 + n_ex]
            x_hbm, y_ref, win, sem = refs[5 + n_ex:]
            b = pl.program_id(0)
            rb0t = rb_ref[b] // SUB
            cp = pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(rb0t, H8), :, :], win, sem
            )
            cp.start()
            cp.wait()
            accs = [
                jnp.zeros((SUB, LANE), dtype=y_ref.dtype) for _ in range(C)
            ]
            for k in range(w):
                ot = ob_ref[b * w + k]
                ddk = hi_ref[k * SUB:(k + 1) * SUB, :]
                lok = lo_ref[k * SUB:(k + 1) * SUB, :]
                datk = dat_ref[k * SUB:(k + 1) * SUB, :]
                V2s = [
                    win[c, pl.ds(ot, T[k]), :, :].reshape(T[k] * SUB, LANE)
                    for c in range(C)
                ]
                gs = [
                    jnp.zeros((SUB, LANE), dtype=x_hbm.dtype)
                    for _ in range(C)
                ]
                for d in range(D[k]):
                    mask = ddk == d
                    for c in range(C):
                        if qd == 1:
                            tile_d = jax.lax.slice(
                                V2s[c], (d, 0),
                                (d + (SUB - 1) * qn + 1, LANE), (qn, 1),
                            )
                        else:
                            parts = []
                            j, srow = 0, 0
                            while srow < SUB:
                                cnt = min(qd, SUB - srow)
                                parts.append(jnp.broadcast_to(
                                    V2s[c][d + j:d + j + 1, :], (cnt, LANE)))
                                j += 1
                                srow += cnt
                            tile_d = jnp.concatenate(parts, axis=0)
                        t = jnp.take_along_axis(tile_d, lok, axis=1)
                        gs[c] = jnp.where(mask, t, gs[c])
                accs = [a + datk * g for a, g in zip(accs, gs)]
            _apply_epi_planes(accs, ex, ex_kinds, epi, escale, y_ref, has_acc)

        y3d = pl.pallas_call(
            dia_kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(W.rb, W.ob, W.hi, W.lo, W.dat, *ex_in, x4d)
        return finish(y3d)

    if W.ht is not None:
        # tap-recentered mode, one plane per column
        ht = W.ht
        H8 = H // SUB
        XR8 = XR // SUB
        x4d = x2d.reshape(C, XR8, SUB, LANE)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb,),
            in_specs=[mat_spec, mat_spec, mat_spec]
            + [ex_spec(k) for k in ex_kinds]
            + [pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((C, H8, SUB, LANE), W.dat.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        )

        def tap_kernel(*refs):
            rb_ref, ob_ref, hi_ref, lo_ref, dat_ref = refs[:5]
            ex = refs[5:5 + n_ex]
            x_hbm, y_ref, win, sem = refs[5 + n_ex:]
            b = pl.program_id(0)
            rb0 = rb_ref[b] // SUB
            cp = pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(rb0, H8), :, :], win, sem
            )
            cp.start()
            cp.wait()
            accs = [
                jnp.zeros((SUB, LANE), dtype=y_ref.dtype) for _ in range(C)
            ]
            for k in range(w):
                o = ob_ref[b * w + k] // SUB
                hik = hi_ref[k * SUB:(k + 1) * SUB, :]
                lok = lo_ref[k * SUB:(k + 1) * SUB, :]
                datk = dat_ref[k * SUB:(k + 1) * SUB, :]
                subs = [
                    win[c, pl.ds(o, ht[k] // SUB), :, :] for c in range(C)
                ]
                gs = [
                    jnp.zeros((SUB, LANE), dtype=x_hbm.dtype)
                    for _ in range(C)
                ]
                for h in range(ht[k]):
                    mask = hik == h
                    for c in range(C):
                        row_b = jnp.broadcast_to(
                            subs[c][h // SUB, h % SUB].reshape(1, LANE),
                            (SUB, LANE),
                        )
                        t = jnp.take_along_axis(row_b, lok, axis=1)
                        gs[c] = jnp.where(mask, t, gs[c])
                accs = [a + datk * g for a, g in zip(accs, gs)]
            _apply_epi_planes(accs, ex, ex_kinds, epi, escale, y_ref, has_acc)

        y3d = pl.pallas_call(
            tap_kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(W.rb, W.ob, W.hi, W.lo, W.dat, *ex_in, x4d)
        return finish(y3d)

    # legacy whole-block-window mode
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[mat_spec, mat_spec, mat_spec]
        + [ex_spec(k) for k in ex_kinds]
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((C, H, LANE), W.dat.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    unrolled = w * H <= _UNROLL_CAP

    def kernel(*refs):
        rb_ref, hb_ref, hi_ref, lo_ref, dat_ref = refs[:5]
        ex = refs[5:5 + n_ex]
        x_hbm, y_ref, win, sem = refs[5 + n_ex:]
        b = pl.program_id(0)
        rb0 = rb_ref[b]
        span = hb_ref[b]
        cp = pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(rb0, H), :], win, sem
        )
        cp.start()
        cp.wait()
        accs = [
            jnp.zeros((SUB, LANE), dtype=y_ref.dtype) for _ in range(C)
        ]
        for k in range(w):
            hik = hi_ref[k * SUB:(k + 1) * SUB, :]
            lok = lo_ref[k * SUB:(k + 1) * SUB, :]
            datk = dat_ref[k * SUB:(k + 1) * SUB, :]
            if unrolled:
                gs = [
                    jnp.zeros((SUB, LANE), dtype=x_hbm.dtype)
                    for _ in range(C)
                ]
                for h in range(H):
                    mask = hik == h
                    for c in range(C):
                        row_b = jnp.broadcast_to(
                            win[c, h, :].reshape(1, LANE), (SUB, LANE)
                        )
                        t = jnp.take_along_axis(row_b, lok, axis=1)
                        gs[c] = jnp.where(mask, t, gs[c])
            else:
                def h_step(h, gs, hik=hik, lok=lok):
                    mask = hik == h
                    out = []
                    for c in range(C):
                        row_b = jnp.broadcast_to(
                            win[c, pl.ds(h, 1), :], (SUB, LANE)
                        )
                        t = jnp.take_along_axis(row_b, lok, axis=1)
                        out.append(jnp.where(mask, t, gs[c]))
                    return tuple(out)

                gs = jax.lax.fori_loop(
                    0, span, h_step,
                    tuple(
                        jnp.zeros((SUB, LANE), dtype=x_hbm.dtype)
                        for _ in range(C)
                    ),
                )
            accs = [a + datk * g for a, g in zip(accs, gs)]
        _apply_epi_planes(accs, ex, ex_kinds, epi, escale, y_ref, has_acc)

    y3d = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(W.rb, W.hb, W.hi, W.lo, W.dat, *ex_in, x2d)
    return finish(y3d)
