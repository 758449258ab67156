"""Stage-2 of the ogre-chain design probe: for each candidate Galerkin
map factorization (one-stage G, two-stage G1/G2), evaluate EVERY window
layout build_well_auto knows (tap + DIA slopes) AND outlier-row
extraction (rows whose window spread poisons the static per-tap spans
are pulled into a small serial-gather side path), reporting predicted
kernel-group counts and select-chain block-iterations.

Usage: python benchmarks/probes/probe_two_stage2.py [mesh] [cap]
"""

import json
import os
import sys

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from probe_ogre_chain import load_hier, tap_spans, groups_of  # noqa: E402
from probe_two_stage import stage1_map, stage2_map  # noqa: E402
from surface_multigrid_code_tpu.ops.well import (  # noqa: E402
    _AUTO_QS,
    B_ROWS,
    LANE,
    dia_costs,
)
from surface_multigrid_code_tpu.solver.wellrefresh import _slot_space  # noqa: E402


def best_layout(G: sp.csr_matrix):
    """(kind, sum_cost, groups, nb) of the best window layout for G."""
    ht, _, w, nb = tap_spans(G)
    best = ("tap", int(ht.sum()), list(map(int, ht)))
    for q, wgt in _AUTO_QS:
        D = dia_costs(G, q)
        c = int(D.sum())
        if wgt * c < best[1]:
            best = (f"dia{q}", c, list(map(int, D)))
    kind, cost, spans = best
    return kind, cost, nb, spans


def extract_wide_rows(G: sp.csr_matrix, T_sublanes: int):
    """Split G into (G_narrow, G_wide) by per-ROW column-window spread."""
    G = G.tocsr()
    rows = np.repeat(np.arange(G.shape[0]), np.diff(G.indptr))
    sub = G.indices // LANE
    lo = np.full(G.shape[0], np.int64(1) << 40)
    hi = np.full(G.shape[0], -1, dtype=np.int64)
    np.minimum.at(lo, rows, sub)
    np.maximum.at(hi, rows, sub)
    spread = np.where(hi >= 0, hi - lo + 1, 0)
    wide = spread > T_sublanes
    mask_wide = wide[rows]
    def pick(m):
        M = sp.csr_matrix(
            (G.data[m], (rows[m], G.indices[m])), shape=G.shape)
        M.sum_duplicates()
        return M
    return pick(~mask_wide), pick(mask_wide), int(wide.sum())


def eval_map(tag, G, cap, T=128):
    out = {"tag": tag, "nnz": int(G.nnz)}
    kind, cost, nb, spans = best_layout(G)
    out["full"] = {"kind": kind, "sum": cost, "groups": groups_of(spans, cap),
                   "blocks": cost * nb}
    Gn, Gw, n_wide = extract_wide_rows(G, T)
    if Gw.nnz:
        kind, cost, nb, spans = best_layout(Gn)
        out[f"narrow_T{T}"] = {
            "kind": kind, "sum": cost, "groups": groups_of(spans, cap),
            "blocks": cost * nb, "wide_rows": n_wide,
            "wide_nnz": int(Gw.nnz),
        }
    return out


def main():
    mesh = sys.argv[1] if len(sys.argv) > 1 else "ogre"
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    As, Ps = load_hier(mesh)
    A = As[0].tocsr()
    n, w, slot = _slot_space(A)

    fill = sp.csr_matrix(
        (np.ones(A.nnz), (slot, np.arange(A.nnz))), shape=(n * w, A.nnz)
    )
    print(json.dumps(eval_map("fill", fill, cap)), flush=True)

    prev_slot, prev_nw = slot, n * w
    for lvi, P in enumerate(Ps):
        from surface_multigrid_code_tpu.solver.galerkin import galerkin_triples

        seg, in_id, wgt, A_out = galerkin_triples(A, P.tocsr())
        nc, wc, slot_c = _slot_space(A_out)
        G = sp.coo_matrix(
            (wgt, (slot_c[seg], prev_slot[in_id])),
            shape=(nc * wc, prev_nw),
        ).tocsr()
        G.sum_duplicates()
        print(json.dumps(eval_map(f"one_lv{lvi+1}", G, cap)), flush=True)

        G1, B, slot_B, nw_B, wB = stage1_map(A, P, prev_slot, prev_nw)
        G2, _, _ = stage2_map(B, P, A_out, slot_B, nw_B)
        print(json.dumps(eval_map(f"two_G1_lv{lvi+1}", G1, cap)), flush=True)
        print(json.dumps(eval_map(f"two_G2_lv{lvi+1}", G2, cap)), flush=True)

        A, prev_slot, prev_nw = A_out, slot_c, nc * wc


if __name__ == "__main__":
    main()
