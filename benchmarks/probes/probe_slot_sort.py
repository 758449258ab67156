"""Probe: per-block slot-column sorting for tap-recentered windows.

Value-static operators can permute each block's ELL slot columns freely;
sorting slots by per-block span (descending) aligns the widest taps into
the same static slot, so ht_k = max_b (k-th largest span of block b) —
the minimum of sum_k max_b span over per-block slot permutations.

    tap        = nb * sum_k ceil8(max_b span_bk)        (canonical slots)
    tap_sorted = nb * sum_k ceil8(max_b sorted_span_bk) (per-block sorted)
    ideal      = sum_b sum_k span_bk                    (per-block bounds)

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python benchmarks/probes/probe_slot_sort.py [order]
"""
import sys

import numpy as np

sys.path.insert(0, ".")
from benchmarks.probes.ico_ops_cache import load_ops  # noqa: E402

B_ROWS = 1024
LANE = 128


def ceil8(x):
    return -(-x // 8) * 8


def slot_costs(A):
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
    big = np.int64(1) << 40
    sub_min = np.where(st, sub, big).min(axis=1)
    sub_max = np.where(st, sub, np.int64(-1)).max(axis=1)
    empty = sub_max < 0
    start = np.where(empty, 0, sub_min // 8 * 8)
    span = np.where(empty, 1, sub_max - start + 1)  # [nb, w]

    tap = sum(ceil8(int(s)) for s in span.max(axis=0))
    srt = np.sort(span, axis=1)[:, ::-1]
    tap_sorted = sum(ceil8(int(s)) for s in srt.max(axis=0))
    ideal = int(np.maximum(span, 1).sum())
    return nb * tap, nb * tap_sorted, ideal, w


def main():
    order = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    As, Ps = load_ops(order)
    tot = {"tap": 0, "srt": 0, "ideal": 0}
    for name, ops in (
        ("A", As),
        ("P", Ps),
        ("PT", [P.T.tocsr() for P in Ps]),
    ):
        for lv, Aop in enumerate(ops):
            t, s, i, w = slot_costs(Aop)
            tot["tap"] += t
            tot["srt"] += s
            tot["ideal"] += i
            print(f"{name}{lv}: n={Aop.shape[0]:>8} w={w:>3} "
                  f"tap={t:>9} sorted={s:>9} ideal={i:>9} "
                  f"sorted/tap={s / max(t, 1):.2f}", flush=True)
    print(f"TOTAL tap={tot['tap']} sorted={tot['srt']} ideal={tot['ideal']} "
          f"sorted/tap={tot['srt'] / tot['tap']:.3f}")


if __name__ == "__main__":
    main()
