"""Predict chain cost of a TWO-STAGE slot-space Galerkin map
(B = A P then C = P^T B) vs the shipped one-stage map (C = P^T A P in one
G per level) — group counts + select-chain lengths per level, host-only.

Round-3 closed a two-stage A/B for the ELL *gather plan* (1.6x fewer
gather elements, not worth a second pass).  For the WINDOWED CHAIN the
economics are different: the one-stage G's ELL width is the max
CONTRIBUTION COUNT per coarse entry (ogre lv1: 1109 taps!), while each
stage's width is degree-sized (~10-40) — and the select-chain cost is
sum_k ht[k], i.e. taps x window spans.

Usage: python benchmarks/probes/probe_two_stage.py [mesh] [cap]
"""

import json
import os
import sys

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from probe_ogre_chain import load_hier, tap_spans, groups_of  # noqa: E402
from surface_multigrid_code_tpu.solver.wellrefresh import _slot_space  # noqa: E402


def boolean(M):
    M = M.tocsr().copy()
    M.data = np.ones_like(M.data)
    M.sum_duplicates()
    return M


def stage1_map(A, P, slot_A, nw_A):
    """G1: B-slots <- A-slots with weight P[j, c], B = A @ P (symbolic)."""
    A = A.tocsr()
    P = P.tocsr()
    B = boolean(boolean(A) @ boolean(P)).tocsr()
    B.sort_indices()
    nB, wB, slot_B = _slot_space(B)
    # triples: for A nnz t=(i,j), P nnz (j,c) -> B entry (i,c)
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
    # B nnz id of (out_r, out_c)
    keys_B = np.repeat(np.arange(nB), np.diff(B.indptr)) * B.shape[1] + B.indices
    q = out_r.astype(np.int64) * B.shape[1] + out_c
    b_id = np.searchsorted(keys_B, q)
    G1 = sp.coo_matrix(
        (P.data[p_id], (slot_B[b_id], slot_A[t])), shape=(nB * wB, nw_A)
    ).tocsr()
    G1.sum_duplicates()
    return G1, B, slot_B, nB * wB, wB


def stage2_map(B, P, A_out, slot_B, nw_B):
    """G2: C-slots <- B-slots with weight P[i, r], C = P^T @ B."""
    B = B.tocsr()
    P = P.tocsr()
    C = A_out.tocsr()
    C.sort_indices()
    nC, wC, slot_C = _slot_space(C)
    # triples: for B nnz u=(i,c), P nnz (i,r) -> C entry (r,c)
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
    keys_C = np.repeat(np.arange(nC), np.diff(C.indptr)) * C.shape[1] + C.indices
    q = out_r.astype(np.int64) * C.shape[1] + out_c
    c_id = np.searchsorted(keys_C, q)
    G2 = sp.coo_matrix(
        (P.data[p_id], (slot_C[c_id], slot_B[u])), shape=(nC * wC, nw_B)
    ).tocsr()
    G2.sum_duplicates()
    return G2, slot_C, nC * wC


def main():
    mesh = sys.argv[1] if len(sys.argv) > 1 else "ogre"
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    As, Ps = load_hier(mesh)
    A = As[0].tocsr()
    n, w, slot = _slot_space(A)

    tot1, tot2 = 0, 0
    sum1, sum2 = 0, 0
    # shared level-0 fill (identical in both designs)
    fill = sp.csr_matrix(
        (np.ones(A.nnz), (slot, np.arange(A.nnz))), shape=(n * w, A.nnz)
    )
    ht, _, _, nbf = tap_spans(fill)
    g_fill = groups_of(ht, cap)
    print(json.dumps({"lv": 0, "fill_groups": g_fill,
                      "fill_sum_ht": int(ht.sum())}), flush=True)
    tot1 += g_fill
    tot2 += g_fill

    prev_slot, prev_nw = slot, n * w
    for lvi, P in enumerate(Ps):
        A_out = As[lvi + 1]
        # ---- one-stage (shipped)
        from surface_multigrid_code_tpu.solver.galerkin import galerkin_triples

        seg, in_id, wgt, A_out_sym = galerkin_triples(A, P.tocsr())
        nc, wc, slot_c = _slot_space(A_out_sym)
        G = sp.coo_matrix(
            (wgt, (slot_c[seg], prev_slot[in_id])),
            shape=(nc * wc, prev_nw),
        ).tocsr()
        G.sum_duplicates()
        ht, _, wG, nbG = tap_spans(G)
        g1s = groups_of(ht, cap)
        one = {"sum_ht": int(ht.sum()), "groups": g1s, "wG": wG, "nb": nbG,
               "chain_blocks": int(ht.sum()) * nbG}

        # ---- two-stage
        G1, B, slot_B, nw_B, wB = stage1_map(A, P, prev_slot, prev_nw)
        ht1, _, wG1, nb1 = tap_spans(G1)
        G2, slot_C2, nw_C = stage2_map(B, P, A_out_sym, slot_B, nw_B)
        ht2, _, wG2, nb2 = tap_spans(G2)
        gg = groups_of(ht1, cap) + groups_of(ht2, cap)
        two = {
            "sum_ht": int(ht1.sum() + ht2.sum()), "groups": gg,
            "wG1": wG1, "wG2": wG2, "wB": wB,
            "nb1": nb1, "nb2": nb2,
            "chain_blocks": int(ht1.sum()) * nb1 + int(ht2.sum()) * nb2,
            "G1_nnz": int(G1.nnz), "G2_nnz": int(G2.nnz),
            "B_slots": nw_B,
        }
        # consistency: G2 @ G1 must equal G on values
        chk = (G2 @ G1 - G)
        two["max_abs_err_vs_one_stage"] = float(abs(chk).max()) if chk.nnz else 0.0

        print(json.dumps({"lv": lvi + 1, "one": one, "two": two}),
              flush=True)
        tot1 += g1s
        tot2 += gg
        sum1 += one["chain_blocks"]
        sum2 += two["chain_blocks"]
        A, prev_slot, prev_nw = A_out_sym, slot_c, nc * wc

    print(json.dumps({
        "mesh": mesh, "cap": cap,
        "total_groups_one_stage": tot1, "total_groups_two_stage": tot2,
        "total_chain_blocks_one": sum1, "total_chain_blocks_two": sum2,
    }), flush=True)


if __name__ == "__main__":
    main()
