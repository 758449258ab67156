"""Probe: cost model for tap-recentered windows vs band-sliced windows.

The windowed kernel (ops/well.py) costs ~3 tile-ops per (tap, window-row,
block). Band slicing bounds the window span per slice at hs rows; this
probe asks whether giving each CSR tap slot its OWN window (re-centered
per (block, tap), 8-aligned so reads stay tile-aligned) is cheaper:

    sliced cost  = nb * sum_s  w_s * H_s      (H_s = global slice span)
    tap cost     = nb * sum_k  HT_k           (HT_k = max_b 8-aligned span
                                               of tap k in block b)
    tap ideal    = sum_b sum_k span_bk        (per-block dynamic bounds)

Run CPU-only:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python benchmarks/probes/probe_tap_windows.py [icosphere_order]
"""

import sys

import numpy as np
import scipy.sparse as sp

B_ROWS = 1024
LANE = 128


def ceil8(x):
    return -(-x // 8) * 8


def tap_costs(A: sp.csr_matrix):
    """(sliced_cost, tap_cost, tap_ideal, H_unsliced, w) for one operator."""
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
    if A.nnz:
        rows = np.repeat(np.arange(n), counts)
        offs = np.arange(A.nnz) - np.repeat(A.indptr[:-1], counts)
        idx[rows, offs] = A.indices
        struct[rows, offs] = True

    sub = idx // LANE  # sublane-row of each element
    sub_b = sub.reshape(nb, B_ROWS, w)
    st_b = struct.reshape(nb, B_ROWS, w)

    # ---- unsliced well_layout span ----
    H_un = 8
    blk_lo = np.zeros(nb, dtype=np.int64)
    blk_hi = np.zeros(nb, dtype=np.int64)
    for b in range(nb):
        if st_b[b].any():
            blk_lo[b] = sub_b[b][st_b[b]].min() // 8 * 8
            blk_hi[b] = sub_b[b][st_b[b]].max()
            H_un = max(H_un, blk_hi[b] - blk_lo[b] + 1)
    H_un = ceil8(H_un)

    # ---- band-sliced cost (hs=32), mirroring build_well_sliced ----
    hs = 32
    sliced_cost = 0
    rel = sub_b - blk_lo[:, None, None]
    band = np.where(st_b, rel // hs, -1)
    for sband in range(int(band.max(initial=0)) + 1):
        mask = band == sband
        if not mask.any():
            continue
        w_s = int(mask.sum(axis=2).max())  # slot compaction: taps/row in band
        # slice's own layout: per-block aligned start over ITS elements only
        H_s = 8
        for b in range(nb):
            mb = mask[b]
            if mb.any():
                lo_s = sub_b[b][mb].min() // 8 * 8
                H_s = max(H_s, sub_b[b][mb].max() - lo_s + 1)
        sliced_cost += w_s * ceil8(H_s)
    sliced_cost *= nb

    # ---- tap-recentered cost ----
    tap_cost = 0
    tap_ideal = 0
    for k in range(w):
        spans = np.zeros(nb, dtype=np.int64)
        for b in range(nb):
            mk = st_b[b, :, k]
            if mk.any():
                s = sub_b[b, :, k][mk]
                spans[b] = s.max() - (s.min() // 8 * 8) + 1
        tap_cost += ceil8(int(spans.max(initial=1)))
        tap_ideal += int(np.maximum(spans, 1).sum())
    tap_cost *= nb

    return sliced_cost, tap_cost, tap_ideal, H_un, w


def main():
    sys.path.insert(0, ".")
    order = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    from surface_multigrid_code_tpu.ops.laplacian import cotmatrix, massmatrix
    from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute
    from surface_multigrid_code_tpu.solver.ordering import (
        finest_rcm,
        induced_orderings,
        permute_hierarchy,
    )
    from surface_multigrid_code_tpu.utils.synthetic import icosphere

    V, F = icosphere(order)
    print(f"icosphere({order}): V={len(V)} F={len(F)}", flush=True)
    mg = mg_precompute(V, F, verbose=False)
    L = cotmatrix(V, F)
    M = massmatrix(V, F)
    A = (M - 0.01 * L).tocsr()
    As = [A]
    Ps = [mg[lv].P_full.tocsr() for lv in range(1, len(mg))]
    for P in Ps:
        As.append((P.T @ As[-1] @ P).tocsr())
    perms = induced_orderings(finest_rcm(As[0]), Ps)
    As, Ps = permute_hierarchy(As, Ps, perms)

    tot = {"sliced": 0, "tap": 0, "ideal": 0}
    for name, ops in (
        ("A", As),
        ("P", Ps),
        ("PT", [P.T.tocsr() for P in Ps]),
    ):
        for lv, Aop in enumerate(ops):
            sc, tc, ti, H, w = tap_costs(Aop)
            tot["sliced"] += sc
            tot["tap"] += tc
            tot["ideal"] += ti
            print(
                f"{name}{lv}: n={Aop.shape[0]:>8} w={w:>3} H={H:>4} "
                f"sliced={sc:>9} tap={tc:>9} ideal={ti:>9} "
                f"tap/sliced={tc / max(sc, 1):.2f}",
                flush=True,
            )
    print(
        f"TOTAL sliced={tot['sliced']} tap={tot['tap']} "
        f"ideal={tot['ideal']} tap/sliced={tot['tap'] / tot['sliced']:.3f} "
        f"ideal/sliced={tot['ideal'] / tot['sliced']:.3f}"
    )


if __name__ == "__main__":
    main()
