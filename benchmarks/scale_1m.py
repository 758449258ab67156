"""Scale validation: 1.31M- to 5.2M-face spheres through the full pipeline.

Stresses exactly what grows with problem size: the native SSP hierarchy
build, host Galerkin coarsening, device upload, and the jitted V-cycle at
fine levels 9x-36x the reference's north-star mesh (bunny_140K_init,
SURVEY.md §6). At depth 8 (655K V) the hierarchy still fits in VMEM; at
depth 9 (2.6M V, finest ELL ~170 MB f32) the smoother streams from HBM,
so the run reports achieved nnz/s against the HBM roofline — the regime
BASELINE.md's ">=80% of roofline" target actually describes.

Usage: python benchmarks/scale_1m.py [depth=8]
Prints one JSON summary line.
"""

import json
import sys
import time

import numpy as np


def main(depth: int = 8):
    import jax
    import jax.numpy as jnp

    from surface_multigrid_code_tpu.config import SolveConfig, SmootherType
    from surface_multigrid_code_tpu.ops.laplacian import cotmatrix, massmatrix
    from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute
    from surface_multigrid_code_tpu.solver.mqwf_mg import (
        min_quad_with_fixed_mg_precompute,
    )
    from surface_multigrid_code_tpu.solver.vcycle import solve_loop
    from surface_multigrid_code_tpu.utils.synthetic import icosphere

    t0 = time.time()
    V, F = icosphere(depth)  # depth 8: 655362 V; depth 9: 2621442 V
    t_mesh = time.time() - t0
    print(f"mesh: |V|={V.shape[0]} |F|={F.shape[0]} ({t_mesh:.1f}s)", flush=True)

    t0 = time.time()
    mg = mg_precompute(V, F, verbose=False)
    t_hier = time.time() - t0
    print(f"hierarchy: {[lvl.V.shape[0] for lvl in mg]} ({t_hier:.1f}s)", flush=True)

    L = cotmatrix(V, F)
    M = massmatrix(V, F)
    A = (M - 0.01 * L).tocsr()
    rhs = np.asarray(M @ V[:, 0])

    cfg = SolveConfig(smoother=SmootherType.JACOBI)
    t0 = time.time()
    data = min_quad_with_fixed_mg_precompute(A, None, mg, cfg=cfg, dtype=jnp.float32)
    t_pre = time.time() - t0
    print(f"precompute: {t_pre:.1f}s", flush=True)

    n_cycles = 8
    rhs_d = jax.device_put(jnp.asarray(rhs, dtype=jnp.float32))
    z0_d = jnp.zeros_like(rhs_d)
    tol_d = jnp.asarray(0.0, dtype=jnp.float32)
    t0 = time.time()
    out = solve_loop(data.hier, rhs_d, z0_d, tol_d, n_cycles, cfg)
    jax.block_until_ready(out)
    t_first = time.time() - t0
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        for _ in range(4):
            out = solve_loop(data.hier, rhs_d, z0_d, tol_d, n_cycles, cfg)
        jax.block_until_ready(out)
        best = min(best, (time.time() - t0) / (4 * n_cycles))
    r_his = [float(r) for r in np.asarray(out[1])[: int(out[2])]]
    rate = (r_his[-1] / r_his[0]) ** (1.0 / max(1, len(r_his) - 1))

    # nnz touched per V-cycle (same accounting as bench.py): per level 4
    # smoother SpMVs + 1 residual SpMV, plus restrict/prolong SpMVs
    nnz = 0
    footprint_b = 0
    for lv, level in enumerate(data.hier.levels):
        a_nnz = int(np.sum(np.asarray(level.A.data) != 0))
        a_slots = int(np.asarray(level.A.data).size)
        footprint_b += 8 * a_slots  # f32 value + i32 index
        sweeps = 4 + 1 if lv < len(data.hier.levels) - 1 else 0
        nnz += sweeps * a_nnz
        if lv > 0:
            p_nnz = int(np.sum(np.asarray(level.P.data) != 0))
            footprint_b += 8 * int(np.asarray(level.P.data).size) * 2
            nnz += 2 * p_nnz
    nnz_per_s = nnz / best

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    hbm_gbps = 819e9 if on_tpu else 50e9
    roofline = hbm_gbps / 12.0  # 4B value + 4B index + ~4B vector per nnz
    vmem_bytes = 128 * 2**20  # v5e VMEM
    regime = "hbm_bound" if footprint_b > vmem_bytes else "vmem_resident"
    print(
        json.dumps(
            {
                "mesh": f"icosphere{depth} |V|={V.shape[0]} |F|={F.shape[0]}",
                "levels": [lvl.V.shape[0] for lvl in mg],
                "regime": regime,
                "operator_footprint_mb": round(footprint_b / 2**20, 1),
                "t_hierarchy_s": round(t_hier, 1),
                "t_precompute_s": round(t_pre, 1),
                "t_compile_s": round(t_first, 1),
                "t_vcycle_ms": round(best * 1e3, 3),
                "gnnz_per_s": round(nnz_per_s / 1e9, 3),
                "frac_of_hbm_roofline": round(nnz_per_s / roofline, 3),
                "residual_reduction_per_cycle": round(float(rate), 4),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
