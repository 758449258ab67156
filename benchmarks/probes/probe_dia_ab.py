"""Real-TPU A/B: tap-recentered vs diagonal-mode windowed kernels on
cached hierarchy operators (benchmarks/probes/ico_ops_cache.py).

Usage: python benchmarks/probes/probe_dia_ab.py [order]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from benchmarks.probes.ico_ops_cache import load_ops  # noqa: E402
from surface_multigrid_code_tpu.ops.well import (  # noqa: E402
    any_spmv,
    build_well_dia,
    build_well_tap,
)


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
    print(f"{name:24s} per-step {per*1e3:8.3f} ms  "
          f"{nnz/max(per,1e-12)/1e9:8.2f} Gnnz/s  (chk {chk:.4e})",
          flush=True)
    return per


def main():
    order = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    print(f"device: {jax.devices()[0]}", flush=True)
    As, Ps = load_ops(order)
    rng = np.random.default_rng(0)

    # square ops chain directly; PT/P as a pair
    cases = [
        ("A0", As[0], None, (1, 1)),
        ("A1", As[1], None, (1, 1)),
        ("PTP0", (Ps[0].T.tocsr(), Ps[0]), None, ((0, 0), (1, 4))),
    ]
    for name, op, _, qs in cases:
        if isinstance(op, tuple):
            PT, P = op
            tp = (build_well_tap(PT, dtype=jnp.float32),
                  build_well_tap(P, dtype=jnp.float32))
            # steep PT has no supported slope: tap for PT, dia for P
            dia = (tp[0],
                   build_well_dia(P, dtype=jnp.float32, q=qs[1]))
            n = P.shape[0]
            nnz = PT.nnz + P.nnz
            x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
            yref = P @ (PT @ np.asarray(x0))
            def steptp(v, tp=tp):
                return any_spmv(tp[1], any_spmv(tp[0], v))
            def stepdia(v, dia=dia):
                return any_spmv(dia[1], any_spmv(dia[0], v))
            csum = (sum(sum(W.ht) for W in tp[0] + tp[1]),
                    sum(sum(W.ht) for W in dia[0] + dia[1]))
        else:
            tp = build_well_tap(op, dtype=jnp.float32)
            dia = build_well_dia(op, dtype=jnp.float32, q=qs)
            n = op.shape[0]
            nnz = op.nnz
            x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
            yref = op @ np.asarray(x0)
            def steptp(v, tp=tp):
                return any_spmv(tp, v)
            def stepdia(v, dia=dia):
                return any_spmv(dia, v)
            csum = (sum(sum(W.ht) for W in tp),
                    sum(sum(W.ht) for W in dia))
        y = np.asarray(stepdia(x0))
        err = np.abs(y - yref).max() / max(np.abs(yref).max(), 1e-30)
        print(f"{name}: n={n} nnz={nnz} chain tap={csum[0]} dia={csum[1]} "
              f"relerr={err:.2e}", flush=True)
        assert err < 1e-4, err
        ttp = bench(f"{name} tap", steptp, x0, nnz)
        tdia = bench(f"{name} dia", stepdia, x0, nnz)
        print(f"{name}: dia speedup {ttp/tdia:.2f}x", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
