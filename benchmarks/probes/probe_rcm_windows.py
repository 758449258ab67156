"""Host-side analysis: RCM window widths per level for the windowed-ELL
Pallas kernel design. H = max over row-blocks of the sublane-row span of
the block's column window; kernel cost scales with H.

Orderings tried:
  per-level : RCM computed on each level's A independently
  induced   : RCM on finest level; coarser levels sorted by their fine
              representative's RCM rank (keeps P/PT windows local too)
"""
import numpy as np
import scipy.sparse as sp
from scipy.sparse.csgraph import reverse_cuthill_mckee

import jax.numpy as jnp

from surface_multigrid_code_tpu.config import SolveConfig, SmootherType
from surface_multigrid_code_tpu.ops.laplacian import cotmatrix, massmatrix
from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute
from surface_multigrid_code_tpu.solver.mqwf_mg import min_quad_with_fixed_mg_precompute
from surface_multigrid_code_tpu.ops.sparse import ell_to_csr
from surface_multigrid_code_tpu.utils.synthetic import icosphere


def block_spans(A, B=1024, lane=128):
    """For each block of B rows: span in sublane rows of its column window."""
    A = A.tocsr()
    n = A.shape[0]
    spans = []
    for s in range(0, n, B):
        cols = A.indices[A.indptr[s]:A.indptr[min(s + B, n)]]
        if cols.size == 0:
            spans.append(0)
            continue
        r0 = cols.min() // lane // 8 * 8          # aligned window start
        r1 = cols.max() // lane
        spans.append(int(r1 - r0 + 1))
    spans = np.array(spans)
    Hmax = int(np.ceil(spans.max() / 8) * 8)
    return Hmax, int(np.median(spans)), int(spans.max())


def report(tag, A, B=1024):
    Hmax, med, mx = block_spans(A, B)
    n = A.shape[0]
    w = int(np.diff(A.tocsr().indptr).max())
    print(f"  {tag:14s} n={n:8d} w={w:3d}  H(max,pad8)={Hmax:4d} med={med:4d} raw_max={mx:4d}")
    return Hmax


for depth in (7,):
    V, F = icosphere(depth)
    mg = mg_precompute(V, F, verbose=False)
    L = cotmatrix(V, F); M = massmatrix(V, F)
    A = (M - 0.01 * L).tocsr()
    cfg = SolveConfig(smoother=SmootherType.JACOBI)
    data = min_quad_with_fixed_mg_precompute(A, None, mg, cfg=cfg, dtype=jnp.float64)

    csrs = [ell_to_csr(l.A) for l in data.hier.levels]
    Ps = [None] + [ell_to_csr(l.P) for l in data.hier.levels[1:]]

    print(f"== depth {depth}: natural order ==")
    for i, c in enumerate(csrs):
        report(f"A lv{i}", c)

    # per-level RCM
    perms = [reverse_cuthill_mckee(c, symmetric_mode=True) for c in csrs]
    print("== per-level RCM ==")
    for i, c in enumerate(csrs):
        p = perms[i]
        report(f"A lv{i}", c[p][:, p])
        if Ps[i] is not None:
            report(f"P lv{i}", Ps[i][perms[i - 1]][:, p])
            report(f"PT lv{i}", (Ps[i][perms[i - 1]][:, p]).T)

    # induced-from-finest ordering
    # each level's rows correspond to coarse vertex ids; MGLevel has
    # fine-index mapping? approximate: order level l by position of its
    # vertices projected into lv0 via cumulative coarse->fine maps is not
    # directly available here; instead order coarser level by the mean
    # fine-RCM rank of P's nonzero rows mapping to it (geometric proxy).
    print("== induced-from-finest ordering ==")
    rank = np.empty(csrs[0].shape[0], dtype=np.int64)
    rank[perms[0]] = np.arange(csrs[0].shape[0])
    cur_rank = rank
    ind_perms = [perms[0]]
    for i in range(1, len(csrs)):
        Pc = Ps[i].tocsc()
        # score of each coarse col = min fine rank of rows using it
        score = np.full(Pc.shape[1], np.inf)
        for c in range(Pc.shape[1]):
            rows = Pc.indices[Pc.indptr[c]:Pc.indptr[c + 1]]
            if rows.size:
                score[c] = cur_rank[rows].min()
        p = np.argsort(score, kind="stable").astype(np.int64)
        ind_perms.append(p)
        r = np.empty(len(p), dtype=np.int64)
        r[p] = np.arange(len(p))
        report(f"A lv{i}", csrs[i][p][:, p])
        report(f"P lv{i}", Ps[i][ind_perms[i - 1]][:, p])
        report(f"PT lv{i}", (Ps[i][ind_perms[i - 1]][:, p]).T)
        cur_rank = r

print("DONE")
