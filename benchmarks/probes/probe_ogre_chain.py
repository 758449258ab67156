"""Diagnose WHY ogre's slot-space Galerkin G maps need 223 Mosaic kernel
groups (vs bunny's 17) under the induced-RCM ordering — the round-3
frontier (VERDICT r3 item 1).  Host-only: stages every level's G map the
way solver/wellrefresh.WellRefreshChain does and reports, per level,

  - the G matrix shape / width / block count,
  - the per-tap static window spans ht[k] (whose sum is the select-chain
    length and whose cap-splitting gives the group count),
  - the distribution of per-ROW fine-support spreads (the quantity the
    window height is governed by): for a coarse row r, the spread of
    sublane positions of the fine slots feeding its entries,

so the slot-space-aware reordering (CLAUDE.md round-4 candidate) can be
designed against the measured failure mode rather than a guess.

Usage: python benchmarks/probes/probe_ogre_chain.py [mesh=ogre] [cap=2048]
"""

import json
import os
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from surface_multigrid_code_tpu.ops.laplacian import cotmatrix, massmatrix  # noqa: E402
from surface_multigrid_code_tpu.ops.well import B_ROWS, LANE  # noqa: E402
from surface_multigrid_code_tpu.solver.galerkin import galerkin_triples  # noqa: E402
from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute  # noqa: E402
from surface_multigrid_code_tpu.solver.ordering import (  # noqa: E402
    finest_rcm,
    induced_orderings,
    permute_hierarchy,
)
from surface_multigrid_code_tpu.solver.wellrefresh import _slot_space  # noqa: E402
from surface_multigrid_code_tpu.utils.obj_io import read_obj  # noqa: E402
from surface_multigrid_code_tpu.utils.paths import mesh_path  # noqa: E402


def load_hier(mesh: str):
    cache = f"/tmp/{mesh}_mcf_ops"
    if os.path.isdir(cache):
        As, Ps = [], []
        lv = 0
        while os.path.exists(f"{cache}/A{lv}.npz"):
            As.append(sp.load_npz(f"{cache}/A{lv}.npz").tocsr())
            lv += 1
        lv = 0
        while os.path.exists(f"{cache}/P{lv}.npz"):
            Ps.append(sp.load_npz(f"{cache}/P{lv}.npz").tocsr())
            lv += 1
        return As, Ps
    V, F = read_obj(mesh_path(mesh))
    t0 = time.time()
    mg = mg_precompute(V, F, verbose=False)
    print(f"{mesh}: hierarchy {time.time()-t0:.1f}s, "
          f"levels {[m.V.shape[0] for m in mg]}", flush=True)
    L = cotmatrix(V, F)
    M = massmatrix(V, F)
    A0 = (M - 0.01 * L).tocsr()
    A0.sum_duplicates()
    Ps = [mg[lv].P_full.tocsr() for lv in range(1, len(mg))]
    perms = induced_orderings(finest_rcm(A0), Ps)
    As, Ps = permute_hierarchy([A0], Ps, perms)
    # full symbolic chain in permuted space (refresh-pattern semantics)
    from surface_multigrid_code_tpu.solver.galerkin import galerkin_chain

    As = galerkin_chain(As[0], Ps)
    os.makedirs(cache, exist_ok=True)
    for lv, A in enumerate(As):
        sp.save_npz(f"{cache}/A{lv}.npz", A.tocsr())
    for lv, P in enumerate(Ps):
        sp.save_npz(f"{cache}/P{lv}.npz", P.tocsr())
    return As, Ps


def tap_spans(G: sp.csr_matrix):
    """Per-tap 8-aligned window spans ht[k] the tap layout would get
    (mirrors ops/well.build_well_tap staging), plus per-block spans."""
    G = G.tocsr()
    G.sum_duplicates()
    n, m = G.shape
    counts = np.diff(G.indptr)
    w = max(int(counts.max(initial=0)), 1)
    nb = max(-(-n // B_ROWS), 1)
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
    span = np.where(empty, 1, sub_max - start + 1)  # [nb, w]
    ht = (-(-np.maximum(span.max(axis=0), 1) // 8) * 8).astype(np.int64)
    return ht, span, w, nb


def groups_of(ht, cap):
    groups, acc = 1, 0
    for h in ht:
        if acc and acc + int(h) > cap:
            groups += 1
            acc = 0
        acc += int(h)
    return groups


def main():
    mesh = sys.argv[1] if len(sys.argv) > 1 else "ogre"
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    As, Ps = load_hier(mesh)
    A = As[0]
    n, w, slot = _slot_space(A)
    print(f"finest: n={n} w={w} nnz={A.nnz}", flush=True)

    report = {"mesh": mesh, "cap": cap, "levels": []}
    total_groups = 0
    # level 0 fill: 0/1 from nnz vector into slots
    fill = sp.csr_matrix(
        (np.ones(A.nnz), (slot, np.arange(A.nnz))), shape=(n * w, A.nnz)
    )
    ht, span, wG, nb = tap_spans(fill)
    g = groups_of(ht, cap)
    total_groups += g
    report["levels"].append({
        "lv": 0, "kind": "fill", "shape": list(fill.shape), "wG": wG,
        "nb": nb, "sum_ht": int(ht.sum()), "groups": g,
    })
    prev_slot, prev_nw, prev_w = slot, n * w, w

    for lvi, P in enumerate(Ps):
        seg, in_id, wgt, A_out = galerkin_triples(A, P.tocsr())
        nc, wc, slot_c = _slot_space(A_out)
        G = sp.coo_matrix(
            (wgt, (slot_c[seg], prev_slot[in_id])),
            shape=(nc * wc, prev_nw),
        ).tocsr()
        G.sum_duplicates()
        ht, span, wG, nb = tap_spans(G)
        g = groups_of(ht, cap)
        total_groups += g

        # per-COARSE-ROW fine-window spread: sublane extent of the fine
        # slots feeding any entry of that coarse row (all taps share it)
        rows_G = np.repeat(np.arange(G.shape[0]), np.diff(G.indptr))
        crow = rows_G // wc
        csub = G.indices // LANE
        lo = np.full(nc, np.int64(1) << 40)
        hi = np.full(nc, -1, dtype=np.int64)
        np.minimum.at(lo, crow, csub)
        np.maximum.at(hi, crow, csub)
        valid = hi >= 0
        spread = np.where(valid, hi - lo + 1, 0)
        qs = np.percentile(spread[valid], [50, 90, 99, 99.9, 100])

        # what the spans would be with per-block medians vs max (how much
        # outlier blocks poison the static per-tap ht)
        span_med = np.median(span, axis=0)
        ht_med = (-(-np.maximum(span_med, 1) // 8) * 8).astype(np.int64)

        lv_rep = {
            "lv": lvi + 1, "kind": "G",
            "shape": list(G.shape), "nnz": int(G.nnz),
            "wG": wG, "nb": nb, "wc": wc,
            "sum_ht": int(ht.sum()), "groups": g,
            "sum_ht_if_median_block": int(ht_med.sum()),
            "row_spread_sublanes_p50_90_99_999_max":
                [float(x) for x in qs],
            "n_rows_spread_gt_256": int((spread > 256).sum()),
            "n_rows_spread_gt_1024": int((spread > 1024).sum()),
        }
        report["levels"].append(lv_rep)
        print(json.dumps(lv_rep), flush=True)
        A, prev_slot, prev_nw, prev_w = A_out, slot_c, nc * wc, wc

    report["total_groups"] = total_groups
    print(json.dumps({"mesh": mesh, "total_groups": total_groups,
                      "cap": cap}), flush=True)


if __name__ == "__main__":
    main()
