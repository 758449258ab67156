"""Predicted select-chain cycle cost under alternative coarse orderings.

The induced-from-finest ordering (solver/ordering.py) keeps P/PT banded
but jumbles coarse rows locally: at icosphere-9, A1's per-tap diagonal
spread is ~32 sublane rows vs ~6-8 for a per-level RCM, and A-levels are
applied 5x per V-cycle (4 smoother sweeps + residual). This probe scores
orderings by the kernel cost model (block-iterations = nb * best
weighted chain over tap/dia candidates, the build_well_auto objective):

  induced-min   current: coarse vertex score = min fine rank
  induced-mean  score = mean fine rank
  own-rcm       per-level RCM, ignoring P/PT correlation
  hybrid        Cuthill-McKee BFS on the coarse graph, start + neighbor
                order tie-broken by the induced score

Run: PYTHONPATH=/root/repo python benchmarks/probes/probe_order_hybrid.py [order]
"""
import sys

import numpy as np
import scipy.sparse as sp
from scipy.sparse.csgraph import reverse_cuthill_mckee

sys.path.insert(0, "/root/repo")
from benchmarks.probes.ico_ops_cache import load_ops  # noqa: E402
from surface_multigrid_code_tpu.ops.well import (  # noqa: E402
    B_ROWS, LANE, _stage_ell, dia_costs, _AUTO_QS,
)


def tap_chain(staged):
    idx, struct, val, n, m, w, nb = staged
    sub = (idx // LANE).reshape(nb, B_ROWS, w)
    st = struct.reshape(nb, B_ROWS, w)
    big = np.int64(1) << 40
    smin = np.where(st, sub, big).min(axis=1)
    smax = np.where(st, sub, -1).max(axis=1)
    empty = smax < 0
    ob = np.where(empty, 0, smin // 8 * 8)
    ht = np.where(empty, 8, smax - ob + 1).max(axis=0)
    ht = -(-ht // 8) * 8
    return int(ht.sum())


def op_cost(M):
    """nb * best weighted chain (the build_well_auto objective)."""
    staged = _stage_ell(M)
    nb = staged[6]
    best = float(tap_chain(staged))
    for q, wgt in _AUTO_QS:
        c = wgt * float(dia_costs(M, q, staged=staged).sum())
        best = min(best, c)
    return nb * best


def scores_induced(rank_fine, P, how="min"):
    Pc = P.tocsc()
    m = Pc.shape[1]
    score = np.full(m, np.float64(np.inf))
    if Pc.nnz:
        rr = rank_fine[Pc.indices].astype(np.float64)
        nz = np.flatnonzero(np.diff(Pc.indptr) > 0)
        if how == "min":
            score[nz] = np.minimum.reduceat(rr, Pc.indptr[nz])
        else:
            sums = np.add.reduceat(rr, Pc.indptr[nz])
            cnts = np.diff(Pc.indptr)[nz]
            score[nz] = sums / cnts
    return score


def cm_bfs(A, score):
    """Cuthill-McKee BFS over A's graph; start + neighbor order by score.
    Returns perm (perm[new] = old); reversed at the end (RCM)."""
    A = A.tocsr()
    n = A.shape[0]
    visited = np.zeros(n, dtype=bool)
    order = np.empty(n, dtype=np.int64)
    pos = 0
    seeds = np.argsort(score, kind="stable")
    si = 0
    from collections import deque
    dq = deque()
    while pos < n:
        while si < n and visited[seeds[si]]:
            si += 1
        if si >= n:
            break
        s = seeds[si]
        visited[s] = True
        dq.append(s)
        while dq:
            v = dq.popleft()
            order[pos] = v
            pos += 1
            nb = A.indices[A.indptr[v]:A.indptr[v + 1]]
            nb = nb[~visited[nb]]
            if nb.size:
                nb = nb[np.argsort(score[nb], kind="stable")]
                visited[nb] = True
                dq.extend(nb.tolist())
    return order[::-1].copy()


def cycle_cost(As, Ps, perms):
    Asp = [As[l].tocsr()[perms[l]][:, perms[l]].tocsr()
           for l in range(len(As))]
    Psp = [Ps[l].tocsr()[perms[l]][:, perms[l + 1]].tocsr()
           for l in range(len(Ps))]
    ca = sum(5 * op_cost(A) for A in Asp[:-1])
    cp = sum(op_cost(P) for P in Psp)
    cpt = sum(op_cost(P.T.tocsr()) for P in Psp)
    return ca, cp, cpt


def main():
    order = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    As, Ps = load_ops(order)
    # NOTE: cached ops are ALREADY induced-min permuted; treat that as the
    # base ordering (identity) and re-derive ranks from it.
    L = len(As)
    n0 = As[0].shape[0]
    rank0 = np.arange(n0)

    def perms_for(mode):
        perms = [np.arange(n0)]
        rank = rank0
        for l, P in enumerate(Ps):
            n_c = P.shape[1]
            if mode in ("induced-min", "induced-mean"):
                sc = scores_induced(rank, P, "min" if mode.endswith("min") else "mean")
                p = np.argsort(sc, kind="stable").astype(np.int64)
            elif mode == "own-rcm":
                p = np.asarray(reverse_cuthill_mckee(
                    As[l + 1].tocsr(), symmetric_mode=True), dtype=np.int64)
            elif mode == "hybrid":
                sc = scores_induced(rank, P, "min")
                p = cm_bfs(As[l + 1], sc)
            perms.append(p)
            rank = np.empty(n_c, dtype=np.int64)
            rank[p] = np.arange(n_c)
        return perms

    for mode in ("induced-min", "induced-mean", "own-rcm", "hybrid"):
        perms = perms_for(mode)
        ca, cp, cpt = cycle_cost(As, Ps, perms)
        print(f"{mode:13s} A(5x)={ca/1e6:9.3f}M  P={cp/1e6:7.3f}M  "
              f"PT={cpt/1e6:7.3f}M  total={(ca+cp+cpt)/1e6:9.3f}M",
              flush=True)


if __name__ == "__main__":
    main()
