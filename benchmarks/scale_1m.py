"""Scale validation: 1.31M-face sphere through the full pipeline on TPU.

Stresses exactly what grows with problem size: the native SSP hierarchy
build, host Galerkin coarsening, device upload, and the jitted V-cycle at
a fine level ~9x the reference's north-star mesh (bunny_140K_init,
SURVEY.md §6). Prints one JSON summary line.
"""

import json
import time

import numpy as np


def main():
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
    V, F = icosphere(8)  # 655362 V / 1310720 F
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
    print(
        json.dumps(
            {
                "mesh": f"icosphere8 |V|={V.shape[0]} |F|={F.shape[0]}",
                "levels": [lvl.V.shape[0] for lvl in mg],
                "t_hierarchy_s": round(t_hier, 1),
                "t_precompute_s": round(t_pre, 1),
                "t_compile_s": round(t_first, 1),
                "t_vcycle_ms": round(best * 1e3, 3),
                "residual_reduction_per_cycle": round(float(rate), 4),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
