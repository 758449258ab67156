"""Build-once cache of induced-RCM-permuted hierarchy operators for an
icosphere order: /tmp/ico{order}_ops/{A<l>,P<l>}.npz. Probes iterate on
layout/cost experiments without re-paying the hierarchy build."""
import os
import sys
import time

import scipy.sparse as sp


def ops_dir(order: int) -> str:
    return f"/tmp/ico{order}_ops"


def load_ops(order: int):
    """(As, Ps) lists of csr matrices, building the cache if absent."""
    d = ops_dir(order)
    if not os.path.isdir(d):
        build_cache(order)
    As, Ps = [], []
    lv = 0
    while os.path.exists(f"{d}/A{lv}.npz"):
        As.append(sp.load_npz(f"{d}/A{lv}.npz").tocsr())
        lv += 1
    lv = 0
    while os.path.exists(f"{d}/P{lv}.npz"):
        Ps.append(sp.load_npz(f"{d}/P{lv}.npz").tocsr())
        lv += 1
    return As, Ps


def build_cache(order: int):
    sys.path.insert(0, ".")
    from surface_multigrid_code_tpu.ops.laplacian import cotmatrix, massmatrix
    from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute
    from surface_multigrid_code_tpu.solver.ordering import (
        finest_rcm,
        induced_orderings,
        permute_hierarchy,
    )
    from surface_multigrid_code_tpu.utils.synthetic import icosphere

    t0 = time.time()
    V, F = icosphere(order)
    mg = mg_precompute(V, F, verbose=False)
    A = (massmatrix(V, F) - 0.01 * cotmatrix(V, F)).tocsr()
    As = [A]
    Ps = [mg[lv].P_full.tocsr() for lv in range(1, len(mg))]
    for P in Ps:
        As.append((P.T @ As[-1] @ P).tocsr())
    perms = induced_orderings(finest_rcm(As[0]), Ps)
    As, Ps = permute_hierarchy(As, Ps, perms)
    d = ops_dir(order)
    os.makedirs(d, exist_ok=True)
    for lv, M in enumerate(As):
        sp.save_npz(f"{d}/A{lv}.npz", M.tocsr())
    for lv, M in enumerate(Ps):
        sp.save_npz(f"{d}/P{lv}.npz", M.tocsr())
    print(f"cached icosphere({order}) ops in {d} "
          f"({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    build_cache(int(sys.argv[1]) if len(sys.argv) > 1 else 7)
