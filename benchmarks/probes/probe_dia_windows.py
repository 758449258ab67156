"""Probe: diagonal-offset (DIA) candidate selection vs tap-recentered rows.

Element (s, l) of an output tile is mesh row 1024b + 128s + l; for a
banded operator its column's window sublane is ~ s + d with d nearly
constant — so selecting over d = (col//128 - s) candidates needs
~span/8 iterations instead of span:

    tap = nb * sum_k ceil8(max_b row-span_bk)              (current)
    dia = nb * sum_k (max_b (dmax_bk - 8*floor(dmin_bk/8)) + 1)

Each dia iteration is a static 8-row shifted slice + take + where — the
same op count per iteration as a tap row.

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python benchmarks/probes/probe_dia_windows.py [order]
"""
import sys

import numpy as np

sys.path.insert(0, ".")
from benchmarks.probes.ico_ops_cache import load_ops  # noqa: E402

B_ROWS = 1024
LANE = 128


def ceil8(x):
    return -(-x // 8) * 8


def dia_costs(A):
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
    sub = (idx // LANE).reshape(nb, B_ROWS, w)
    st = struct.reshape(nb, B_ROWS, w)
    s_of_row = (np.arange(B_ROWS) // LANE)[None, :, None]  # out sublane
    big = np.int64(1) << 40

    # slope search: candidate row for sublane s is floor(q*s) + d; the
    # operator's natural slope is ~ n_cols / n_rows
    best = None
    for qn, qd in ((0, 1), (1, 8), (1, 4), (1, 2), (1, 1), (2, 1),
                   (4, 1), (8, 1)):
        di = sub - (qn * s_of_row) // qd
        dmin = np.where(st, di, big).min(axis=1)            # [nb, w]
        dmax = np.where(st, di, -big).max(axis=1)
        empty = ~st.any(axis=1)
        dmin = np.where(empty, 0, dmin)
        dmax = np.where(empty, 0, dmax)
        dd_span = dmax - (dmin // 8) * 8 + 1                # per (b,k)
        cost = int(dd_span.max(axis=0).sum())
        ideal = int(np.maximum(dmax - dmin + 1, 1).sum())
        if best is None or cost < best[0]:
            best = (cost, ideal, f"{qn}/{qd}")
    dia, dia_ideal_q, q = best

    # current tap cost for comparison
    sub_min = np.where(st, sub, big).min(axis=1)
    sub_max = np.where(st, sub, np.int64(-1)).max(axis=1)
    e2 = sub_max < 0
    start = np.where(e2, 0, sub_min // 8 * 8)
    span = np.where(e2, 1, sub_max - start + 1)
    tap = sum(ceil8(int(s)) for s in span.max(axis=0))
    return nb * tap, nb * dia, dia_ideal_q, w, q


def main():
    order = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    As, Ps = load_ops(order)
    tot = {"tap": 0, "dia": 0, "ideal": 0}
    for name, ops in (
        ("A", As),
        ("P", Ps),
        ("PT", [P.T.tocsr() for P in Ps]),
    ):
        for lv, Aop in enumerate(ops):
            t, d, i, w, q = dia_costs(Aop)
            tot["tap"] += t
            tot["dia"] += d
            tot["ideal"] += i
            print(f"{name}{lv}: n={Aop.shape[0]:>8} w={w:>3} "
                  f"tap={t:>9} dia={d:>9} dia_ideal={i:>9} q={q:>4} "
                  f"dia/tap={d / max(t, 1):.2f}", flush=True)
    print(f"TOTAL tap={tot['tap']} dia={tot['dia']} "
          f"ideal={tot['ideal']} dia/tap={tot['dia'] / tot['tap']:.3f}")


if __name__ == "__main__":
    main()
