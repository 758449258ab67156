"""First TPU execution evidence for the sharded windowed refresh
(parallel/wellhalo.enable_refresh/solve_values) — VERDICT r3 item 4.

Only one chip exists here, so this runs the FULL multi-chip program
(shard_map over a 1-device mesh: band-segment halos, per-shard
well_repack_tap, stacked slot-space G blocks, sharded power iteration,
psum'd coarse rebuild) on the real chip and slope-times it against the
ELL halo backend (parallel/halo.py enable_refresh), the replicated-
gather correctness reference.

Method: t(max_iter=k) = host+dispatch + refresh + k * cycle; the cycle
cost is the slope between k=2 and k=12 (same compiled program — the
solve loop is a traced while_loop), the refresh+overhead is the
intercept.  Each timing is the best of 5 wall-clock calls with a
readback (float(sum)) forcing completion.

Usage: python benchmarks/probes/probe_wellhalo_tpu.py [mesh=bunny]
"""
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from surface_multigrid_code_tpu.config import (  # noqa: E402
    SmootherType,
    SolveConfig,
)
from surface_multigrid_code_tpu.ops.laplacian import (  # noqa: E402
    cotmatrix,
    massmatrix,
)
from surface_multigrid_code_tpu.solver.galerkin import (  # noqa: E402
    galerkin_chain,
)
from surface_multigrid_code_tpu.solver.hierarchy import (  # noqa: E402
    mg_precompute,
)
from surface_multigrid_code_tpu.utils.mesh import (  # noqa: E402
    normalize_unit_area,
)
from surface_multigrid_code_tpu.utils.obj_io import read_obj  # noqa: E402
from surface_multigrid_code_tpu.utils.paths import mesh_path  # noqa: E402


def timed_solve(h, vals, rhs, k):
    t_best = float("inf")
    z = None
    for _ in range(5):
        t0 = time.time()
        z, r_his, _ok = h.solve_values(
            vals, rhs, tolerance=0.0, max_iter=k
        )
        float(np.sum(z))
        t_best = min(t_best, time.time() - t0)
    return t_best, r_his


def main():
    mesh = sys.argv[1] if len(sys.argv) > 1 else "bunny"
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    V, F = read_obj(mesh_path(mesh))
    V = normalize_unit_area(V, F)
    t0 = time.time()
    mg = mg_precompute(V, F, verbose=False)
    print(f"hier {time.time()-t0:.1f}s", flush=True)

    L = cotmatrix(V, F).tocsr()
    L.sum_duplicates()
    M = massmatrix(V, F)
    A0 = (M - 0.01 * L).tocsr()
    A0.sum_duplicates()
    Ps = [mg[lv].P_full.tocsr() for lv in range(1, len(mg))]
    As = galerkin_chain(A0, Ps)
    rhs = np.asarray(M @ V)  # [n, 3] — the MCF shape
    vals = jnp.asarray(A0.data)

    from jax.sharding import Mesh

    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("rows",))
    cfg = SolveConfig(smoother=SmootherType.JACOBI)

    out = {"mesh": mesh, "device": str(dev), "n": int(A0.shape[0]),
           "backends": {}}
    for name in ("well", "halo"):
        if name == "well":
            from surface_multigrid_code_tpu.parallel.wellhalo import (
                WellHaloHierarchy,
            )

            t0 = time.time()
            h = WellHaloHierarchy(
                As, Ps, mesh1, cfg=cfg, dtype=jnp.float32
            ).enable_refresh()
            t_build = time.time() - t0
        else:
            from surface_multigrid_code_tpu.parallel.halo import (
                HaloHierarchy,
            )

            t0 = time.time()
            h = HaloHierarchy(
                As, Ps, mesh1, cfg=cfg, dtype=jnp.float32
            ).enable_refresh()
            t_build = time.time() - t0
        t0 = time.time()
        t2, r2 = timed_solve(h, vals, rhs, 2)  # includes compile on call 1
        t_first = time.time() - t0
        t12, r12 = timed_solve(h, vals, rhs, 12)
        cycle_ms = (t12 - t2) / 10.0 * 1e3
        refresh_overhead_ms = t2 * 1e3 - 2 * cycle_ms
        out["backends"][name] = {
            "t_build_s": round(t_build, 1),
            "t_first_call_s": round(t_first, 1),
            "t_k2_ms": round(t2 * 1e3, 2),
            "t_k12_ms": round(t12 * 1e3, 2),
            "cycle_ms": round(cycle_ms, 3),
            "refresh_plus_overhead_ms": round(refresh_overhead_ms, 2),
            "r_his_k12": [float(f"{r:.6e}") for r in r12],
        }
        print(json.dumps({name: out["backends"][name]}), flush=True)

    rw = out["backends"]["well"]["r_his_k12"]
    rh = out["backends"]["halo"]["r_his_k12"]
    out["histories_match_rtol"] = float(
        max(abs(a - b) / max(abs(b), 1e-30) for a, b in zip(rw, rh))
    )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
