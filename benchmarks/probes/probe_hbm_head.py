"""HBM-bound V-cycle timing at HEAD on cached icosphere-9 operators.

Builds the device hierarchy (well=True auto layouts) from the cached
induced-RCM-permuted operators and slope-times full V-cycles (readback-
forced, 8 vs 24 chained cycles). Prints a JSON blob for SCALE_HBM
artifacts.

Usage: python benchmarks/probes/probe_hbm_head.py [order] [smoother]
"""
import faulthandler
import json
import sys
import time

# self-report a stack every 10 min — diagnoses silent multi-minute
# stages (host staging vs tunnel upload vs XLA/Mosaic compile)
faulthandler.dump_traceback_later(600, repeat=True)

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from benchmarks.probes.ico_ops_cache import load_ops  # noqa: E402
from surface_multigrid_code_tpu.config import (  # noqa: E402
    SmootherType,
    SolveConfig,
)
from surface_multigrid_code_tpu.solver.vcycle import (  # noqa: E402
    build_device_hierarchy,
    vcycle,
)


def main():
    order = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    smoother = sys.argv[2] if len(sys.argv) > 2 else "jacobi"
    print(f"device: {jax.devices()[0]}", flush=True)
    As, Ps = load_ops(order)
    n = As[0].shape[0]
    cfg = SolveConfig(smoother=SmootherType[smoother.upper()])

    print(f"ops loaded: {len(As)} levels, nnz0={As[0].nnz}", flush=True)
    t0 = time.time()
    hier = build_device_hierarchy(
        As, Ps, cfg=cfg, dtype=jnp.float32, well=True
    )
    jax.block_until_ready(hier.levels[0].diag)
    t_build = time.time() - t0
    layouts = []
    for lv, L in enumerate(hier.levels):
        for tag, W in (("A", L.Aw), ("P", L.Pw), ("PT", L.PTw)):
            if W is None:
                continue
            q = W[0].q if isinstance(W, tuple) else W.q
            chain = sum(sum(x.ht) for x in (W if isinstance(W, tuple)
                                            else (W,)))
            layouts.append(f"{tag}{lv}:q={q},chain={chain}")
    print("; ".join(layouts), flush=True)
    print(f"hier device build: {t_build:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    # ONE compiled program with a TRACED cycle count (fori_loop lowers a
    # traced bound to a while loop) — giant unrolled Mosaic kernel bodies
    # at this scale compile for 10-20+ min, so K=8/K=24 must share it.
    # hier/b MUST be jit arguments: closure capture embeds them as HLO
    # constants and the axon remote-compile request blows its body-size
    # limit (HTTP 413) on the ~500 MB of operator data.
    def run(h, bb, u0, K):
        def body(i, u):
            u = vcycle(h, bb, u, cfg)
            return u / jnp.sqrt(jnp.mean(u * u) + 1e-30)
        return jnp.sum(jax.lax.fori_loop(0, K, body, u0))

    f = jax.jit(run)

    u0 = jnp.zeros_like(b)
    t0 = time.time()
    chk = float(f(hier, b, u0, jnp.int32(1)))
    print(f"compile+first cycle: {time.time()-t0:.1f}s (chk {chk:.4e})",
          flush=True)
    ts = {}
    for K in (8, 24):
        chk = float(f(hier, b, u0, jnp.int32(K)))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            chk = float(f(hier, b, u0, jnp.int32(K)))
            best = min(best, time.time() - t0)
        ts[K] = best
        print(f"K={K}: best {best:.3f}s (chk {chk:.4e})", flush=True)
    per = (ts[24] - ts[8]) / 16.0
    nnz_cycle = sum(3 * A.nnz for A in As[:-1]) + sum(
        2 * (P.nnz * 2) for P in Ps)  # 2+2 jacobi + resid ~ 3 A-spmvs?
    # report raw; exact nnz/cycle bookkeeping done by the artifact writer
    out = {
        "order": order,
        "n": n,
        "smoother": smoother,
        "t_per_cycle_ms": round(per * 1e3, 3),
        "slope_basis": {"K8_s": round(ts[8], 3), "K24_s": round(ts[24], 3)},
        "layouts": layouts,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
