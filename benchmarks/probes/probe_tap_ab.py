"""Real-TPU A/B: band-sliced windows (build_well_sliced) vs tap-recentered
windows (build_well_tap) on actual hierarchy operators.

Timing: readback-forced slope (jit returns a data-dependent scalar; cost
is the slope between two chained-iteration counts) per CLAUDE.md.

Usage: python benchmarks/probes/probe_tap_ab.py [icosphere_order]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from surface_multigrid_code_tpu.ops.laplacian import cotmatrix, massmatrix
from surface_multigrid_code_tpu.ops.well import (
    any_spmv,
    build_well_sliced,
    build_well_tap,
)
from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute
from surface_multigrid_code_tpu.solver.ordering import (
    finest_rcm,
    induced_orderings,
    permute_hierarchy,
)
from surface_multigrid_code_tpu.utils.synthetic import icosphere


def bench(name, step, x0, nnz, ks=(100, 500)):
    ts = {}
    chk = None
    for K in ks:
        f = jax.jit(lambda x, K=K: jnp.sum(jax.lax.fori_loop(
            0, K,
            lambda i, v: (lambda y: y / jnp.sqrt(jnp.mean(y * y) + 1e-30))(
                step(v)),
            x)))
        chk = float(f(x0))
        best = float("inf")
        for _ in range(4):
            t0 = time.time()
            chk = float(f(x0))
            best = min(best, time.time() - t0)
        ts[K] = best
    per = (ts[ks[1]] - ts[ks[0]]) / (ks[1] - ks[0])
    print(f"{name:28s} per-step {per*1e3:8.3f} ms  "
          f"{nnz/max(per,1e-12)/1e9:8.2f} Gnnz/s  (chk {chk:.4e})",
          flush=True)
    return per


def main():
    order = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    V, F = icosphere(order)
    print(f"icosphere({order}): V={len(V)}", flush=True)
    t0 = time.time()
    mg = mg_precompute(V, F, verbose=False)
    print(f"hierarchy: {time.time()-t0:.1f}s", flush=True)
    A = (massmatrix(V, F) - 0.01 * cotmatrix(V, F)).tocsr()
    As = [A]
    Ps = [mg[lv].P_full.tocsr() for lv in range(1, len(mg))]
    for P in Ps:
        As.append((P.T @ As[-1] @ P).tocsr())
    perms = induced_orderings(finest_rcm(As[0]), Ps)
    As, Ps = permute_hierarchy(As, Ps, perms)
    rng = np.random.default_rng(0)

    results = {}
    for name, op, sq in (
        ("A0", As[0], True),
        ("A1", As[1], True),
        ("PTP0", (Ps[0].T.tocsr(), Ps[0]), False),
    ):
        if sq:
            Asl = build_well_sliced(op, dtype=jnp.float32)
            Atp = build_well_tap(op, dtype=jnp.float32)
            n = op.shape[0]
            nnz = op.nnz
            x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
            yref = op @ np.asarray(x0)
            def stepsl(v, Asl=Asl):
                return any_spmv(Asl, v)
            def steptp(v, Atp=Atp):
                return any_spmv(Atp, v)
        else:
            PT, P = op
            Asl = (build_well_sliced(PT, dtype=jnp.float32),
                   build_well_sliced(P, dtype=jnp.float32))
            Atp = (build_well_tap(PT, dtype=jnp.float32),
                   build_well_tap(P, dtype=jnp.float32))
            n = P.shape[0]
            nnz = PT.nnz + P.nnz
            x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
            yref = P @ (PT @ np.asarray(x0))
            def stepsl(v, Asl=Asl):
                return any_spmv(Asl[1], any_spmv(Asl[0], v))
            def steptp(v, Atp=Atp):
                return any_spmv(Atp[1], any_spmv(Atp[0], v))

        y_tp = np.asarray(steptp(x0))
        err = np.abs(y_tp - yref).max() / max(np.abs(yref).max(), 1e-30)
        print(f"{name}: n={n} nnz={nnz} tap-groups htsum="
              f"{sum(sum(W.ht) for W in (Atp if sq else Atp[0]+Atp[1]))} "
              f"relerr={err:.2e}", flush=True)
        assert err < 1e-4, err
        tsl = bench(f"{name} sliced", stepsl, x0, nnz)
        ttp = bench(f"{name} tap", steptp, x0, nnz)
        results[name] = (tsl, ttp)
        print(f"{name}: tap speedup {tsl/ttp:.2f}x", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
