"""A/B: batched multi-RHS (planes) windowed kernels vs per-column calls.

Times, on cached induced-RCM icosphere operators (readback-forced slope,
traced iteration counts so all K share one compile):
  1. finest-level SpMV: one planes call for C=3 vs 3 single-column calls
  2. full V-cycle, [n,3] RHS: planes-tiled flow vs 3 single-column cycles

Usage: python benchmarks/probes/probe_multirhs.py [order]
"""
import faulthandler
import json
import sys
import time

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
from surface_multigrid_code_tpu.ops.well import well_apply  # noqa: E402
from surface_multigrid_code_tpu.solver.vcycle import (  # noqa: E402
    _vcycle_tiled,
    build_device_hierarchy,
)


def slope(f, args, k_lo, k_hi, reps=4):
    """Best-of-reps slope timing of a (args..., K)->scalar jitted fn."""
    ts = {}
    for K in (k_lo, k_hi):
        float(f(*args, jnp.int32(K)))  # warm (compile shared via traced K)
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            float(f(*args, jnp.int32(K)))
            best = min(best, time.time() - t0)
        ts[K] = best
    return (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo), ts


def main():
    order = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    print(f"device: {jax.devices()[0]}", flush=True)
    As, Ps = load_ops(order)
    n = As[0].shape[0]
    cfg = SolveConfig(smoother=SmootherType.JACOBI)
    t0 = time.time()
    hier = build_device_hierarchy(As, Ps, cfg=cfg, dtype=jnp.float32,
                                  well=True)
    jax.block_until_ready(hier.levels[0].diag)
    print(f"hier build {time.time()-t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    Xp = jnp.asarray(rng.standard_normal((3, n)).astype(np.float32))
    Aw = hier.levels[0].Aw
    nnzA = int(As[0].nnz)

    # --- 1. finest SpMV ---
    def spmv_planes(h, xp, K):
        A = h.levels[0].Aw

        def body(i, x):
            y = well_apply(A, x)
            return y / jnp.sqrt(jnp.mean(y * y) + 1e-30)

        return jnp.sum(jax.lax.fori_loop(0, K, body, xp))

    def spmv_cols(h, xp, K):
        A = h.levels[0].Aw

        def body(i, x):
            ys = [well_apply(A, x[c]) for c in range(3)]
            y = jnp.stack(ys, axis=0)
            return y / jnp.sqrt(jnp.mean(y * y) + 1e-30)

        return jnp.sum(jax.lax.fori_loop(0, K, body, xp))

    out = {"order": order, "n": n, "nnz0": nnzA}
    for tag, fn, (klo, khi) in (
        ("spmv_planes", spmv_planes, (32, 160)),
        ("spmv_cols", spmv_cols, (32, 160)),
    ):
        t0 = time.time()
        f = jax.jit(fn)
        per, ts = slope(f, (hier, Xp), klo, khi)
        print(f"{tag}: {per*1e3:.4f} ms/iter (compile+run {time.time()-t0:.0f}s,"
              f" {ts})", flush=True)
        out[tag + "_ms"] = round(per * 1e3, 4)

    # --- 2. full V-cycle, 3 columns ---
    Bp = Xp

    def vc_planes(h, bp, K):
        def body(i, u):
            u = _vcycle_tiled(h, bp, u, cfg)
            return u / jnp.sqrt(jnp.mean(u * u) + 1e-30)

        return jnp.sum(jax.lax.fori_loop(0, K, body, jnp.zeros_like(bp)))

    def vc_cols(h, bp, K):
        def body(i, u):
            us = [_vcycle_tiled(h, bp[c], u[c], cfg) for c in range(3)]
            u = jnp.stack(us, axis=0)
            return u / jnp.sqrt(jnp.mean(u * u) + 1e-30)

        return jnp.sum(jax.lax.fori_loop(0, K, body, jnp.zeros_like(bp)))

    for tag, fn, (klo, khi) in (
        ("vcycle_planes", vc_planes, (8, 40)),
        ("vcycle_cols", vc_cols, (8, 40)),
    ):
        t0 = time.time()
        f = jax.jit(fn)
        per, ts = slope(f, (hier, Bp), klo, khi)
        print(f"{tag}: {per*1e3:.4f} ms/iter (compile+run {time.time()-t0:.0f}s,"
              f" {ts})", flush=True)
        out[tag + "_ms"] = round(per * 1e3, 4)

    out["spmv_speedup"] = round(out["spmv_cols_ms"] / out["spmv_planes_ms"], 3)
    out["vcycle_speedup"] = round(
        out["vcycle_cols_ms"] / out["vcycle_planes_ms"], 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
