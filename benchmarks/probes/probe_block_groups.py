"""Predicted select-chain cost of per-block-group static layouts.

The tap/dia kernels unroll with per-tap bounds ht[k] = max over ALL
blocks of the tap's (recentered) span, so one outlier block inflates
every block's iteration count. Grouping blocks by total span and
building one layout per group (the kernel grid then runs per group with
prefetched output-block index maps) recovers most of the gap to the
per-block ideal. This probe prints, per operator, block-iteration
totals (nb-weighted): static / G=2 / G=4 / G=8 / ideal.

Run: PYTHONPATH=/root/repo python benchmarks/probes/probe_block_groups.py [order]
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from benchmarks.probes.ico_ops_cache import load_ops  # noqa: E402
from surface_multigrid_code_tpu.ops.well import (  # noqa: E402
    B_ROWS, LANE, _stage_ell,
)


def ceil8(x):
    return -(-x // 8) * 8


def spans(M):
    idx, struct, val, n, m, w, nb = _stage_ell(M)
    sub = (idx // LANE).reshape(nb, B_ROWS, w)
    st = struct.reshape(nb, B_ROWS, w)
    big = np.int64(1) << 40
    smin = np.where(st, sub, big).min(axis=1)          # [nb, w]
    smax = np.where(st, sub, -1).max(axis=1)
    empty = smax < 0
    ob = np.where(empty, 0, smin // 8 * 8)
    span = np.where(empty, 8, ceil8(smax - ob + 1))    # [nb, w]
    return span, nb, w


def group_cost(span, nb, G):
    order = np.argsort(span.sum(axis=1))
    cost = 0
    for g in range(G):
        blocks = order[g * nb // G:(g + 1) * nb // G]
        if blocks.size == 0:
            continue
        cost += blocks.size * span[blocks].max(axis=0).sum()
    return int(cost)


def main():
    order = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    As, Ps = load_ops(order)
    ops = [(f"A{l}", A) for l, A in enumerate(As)]
    ops += [(f"P{l}", P) for l, P in enumerate(Ps)]
    ops += [(f"PT{l}", P.T.tocsr()) for l, P in enumerate(Ps)]
    tot = np.zeros(5, dtype=np.int64)
    for name, M in ops:
        span, nb, w = spans(M)
        static = nb * int(span.max(axis=0).sum())
        g2 = group_cost(span, nb, 2)
        g4 = group_cost(span, nb, 4)
        g8 = group_cost(span, nb, 8)
        ideal = int(span.sum())
        tot += (static, g2, g4, g8, ideal)
        print(f"{name:5s} nb={nb:5d} w={w:3d} static={static:9d} "
              f"G2={g2:9d} G4={g4:9d} G8={g8:9d} ideal={ideal:9d} "
              f"G4/static={g4/static:.2f}")
    s, g2, g4, g8, ideal = tot
    print(f"TOTAL static={s} G2={g2} ({g2/s:.2f}) G4={g4} ({g4/s:.2f}) "
          f"G8={g8} ({g8/s:.2f}) ideal={ideal} ({ideal/s:.2f})")


if __name__ == "__main__":
    main()
