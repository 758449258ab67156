"""Benchmark: V-cycle smoother/SpMV throughput on a bunny_140K-class mesh.

Runs the full pipeline — SSP hierarchy precompute (native engine) +
Galerkin coarsening + jitted V-cycle — on a 327K-face mesh (~2.3x the
BASELINE.md north-star) and reports steady-state device throughput as
nnz/s through the smoother+residual SpMV path, the metric BASELINE.json
designates as primary.  Also times one full BSR implicit-Euler balloon
step on bunny_15K (the reference's example-06 hot loop,
sim_utils/implicit_euler_mg_balloon.h:67-78) as `balloon_step_ms`.

REGIME HONESTY: at this size the whole hierarchy is VMEM-resident, so
the HBM roofline does not bind — `vs_baseline` (achieved nnz/s over the
BASELINE.md target of 80% of the HBM roofline, f32 ELL: 4B value + 4B
index + ~4B vector traffic per nnz) measures how far past the
memory-bound target the on-chip regime reaches, not sustained HBM
bandwidth.  The HBM-BOUND datapoint lives in benchmarks/SCALE_HBM_r2.json
(icosphere-9, 5.2M faces, operator >> VMEM), tagged regime=hbm_bound;
`detail.regime` here says which regime this line measured.

Prints ONE JSON line on stdout.
"""

import json
import sys
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
    from surface_multigrid_code_tpu.utils.synthetic import icosphere

    dev = jax.devices()[0]
    on_tpu = dev.platform not in ("cpu",)

    # beyond-bunny_140K-class problem (the shipped meshes top out at 40K
    # faces; BASELINE.json's north-star mesh bunny_140K_init is not in the
    # repo) — icosphere(7) is 327K faces, ~2.3x the north-star size
    t0 = time.time()
    V, F = icosphere(7 if on_tpu else 4)  # 163842 V / 327680 F on TPU
    mg = mg_precompute(V, F, verbose=False)
    t_hier = time.time() - t0

    L = cotmatrix(V, F)
    M = massmatrix(V, F)
    A = (M - 0.01 * L).tocsr()
    rhs = np.asarray(M @ V[:, 0])

    cfg = SolveConfig(smoother=SmootherType.JACOBI)
    t0 = time.time()
    data = min_quad_with_fixed_mg_precompute(A, None, mg, cfg=cfg, dtype=jnp.float32)
    t_pre = time.time() - t0

    # Time the DEVICE-RESIDENT jitted solve loop directly: the public solve
    # wrapper's host<->device transfers are dominated by the axon tunnel in
    # this environment and would measure the link, not the chip.
    #
    # TIMING METHODOLOGY (readback-forced slope, see CLAUDE.md): through
    # the axon tunnel `jax.block_until_ready` returns BEFORE device
    # execution finishes, so every timing jits a data-dependent SCALAR out
    # and times `float(f(...))`; the per-cycle cost is the SLOPE between
    # two chained cycle counts, cancelling the ~29 ms scalar-roundtrip +
    # dispatch constant.
    from surface_multigrid_code_tpu.solver.vcycle import solve_loop

    if data.perm is not None:
        rhs = rhs[data.perm]  # solve in the kernel's RCM ordering
    rhs_d = jax.device_put(jnp.asarray(rhs, dtype=jnp.float32))
    z0_d = jnp.zeros_like(rhs_d)
    tol_d = jnp.asarray(0.0, dtype=jnp.float32)
    t_at = {}
    for n_cyc in (8, 40):
        f = jax.jit(
            lambda h, b, z, t, n=n_cyc: jnp.sum(solve_loop(h, b, z, t, n, cfg)[0])
        )
        float(f(data.hier, rhs_d, z0_d, tol_d))  # compile
        best = float("inf")
        for _ in range(5):
            t0 = time.time()
            float(f(data.hier, rhs_d, z0_d, tol_d))
            best = min(best, time.time() - t0)
        t_at[n_cyc] = best
    t_cycle = (t_at[40] - t_at[8]) / 32.0
    out = solve_loop(data.hier, rhs_d, z0_d, tol_d, 8, cfg)
    r_his = [float(r) for r in np.asarray(out[1])[: int(out[2])]]

    # nnz touched per V-cycle: per level, 4 smoother sweeps (SpMV each) +
    # 1 residual SpMV + restrict/prolong SpMVs (SURVEY.md §3.3)
    nnz = 0
    for lv, level in enumerate(data.hier.levels):
        a_nnz = int(np.sum(np.asarray(level.A.data) != 0))
        sweeps = 4 + 1 if lv < len(data.hier.levels) - 1 else 0
        nnz += sweeps * a_nnz
        if lv > 0:
            p_nnz = int(np.sum(np.asarray(level.P.data) != 0))
            nnz += 2 * p_nnz
    nnz_per_s = nnz / t_cycle

    # roofline: v5e HBM ~819 GB/s; ELL SpMV reads 4B value + 4B index +
    # ~4B vector gather per nonzero in f32
    hbm_gbps = 819e9 if on_tpu else 50e9
    roofline = hbm_gbps / 12.0
    target = 0.8 * roofline

    resid_rate = (r_his[-1] / r_his[0]) ** (1.0 / max(1, len(r_his) - 1)) if len(r_his) > 1 else 0.0

    # Balloon step (BSR path, the run_balloon default) on bunny_15K.
    # Timed AFTER the V-cycle numbers: building the balloon stack can
    # flip the tunneled dispatch path into its ~13ms/dispatch mode
    # (CLAUDE.md), which must not pollute the SpMV timing above.  The
    # step itself is ONE dispatch, so the artifact adds <=2% here.
    balloon_ms = None
    if on_tpu:
        from surface_multigrid_code_tpu.models.balloon import (
            BsrBalloonStepper,
            lumped_mass_matrix,
            vertex_normals,
        )
        from surface_multigrid_code_tpu.models.shell import (
            ShellEnergy,
            lame_parameters,
        )
        from surface_multigrid_code_tpu.utils.obj_io import read_obj
        from surface_multigrid_code_tpu.utils.paths import mesh_path

        Vb, Fb = read_obj(mesh_path("bunny_15K_init"))
        al, be = lame_parameters(6e6, 0.5 - 1e-3)
        shell = ShellEnergy(Vb, Fb, 1e-1, al, be, "neohookean")
        Mb = 1000.0 * lumped_mass_matrix(Vb, Fb)
        mg_v = mg_precompute(Vb, Fb, verbose=False)
        stepper = BsrBalloonStepper(shell, Mb, mg_v, 1e-3, mg_tolerance=2e-1)
        Nrm = vertex_normals(Vb, Fb)
        Mvd = np.asarray(massmatrix(Vb, Fb, kind="voronoi").diagonal())
        fExt3 = -(Nrm * Mvd[:, None]) * 1e6
        Vp = Vb
        # the private jitted _step runs in the solver's permuted vertex
        # order (well mode); unpermuted inputs scramble the geometry ->
        # Chebyshev nan -> wrong line-search while_loop trip counts
        if stepper._vperm is not None:
            Vp = Vb[stepper._vperm]
            fExt3 = fExt3[stepper._vperm]
        fExt = jnp.asarray(fExt3.reshape(-1), dtype=stepper.dtype)
        xv = jnp.asarray(Vp, dtype=stepper.dtype)
        qd0 = jnp.zeros(3 * Vb.shape[0], dtype=stepper.dtype)
        # readback-forced (eager sum + float()): the step is seconds-scale
        # and one dispatch, so the ~29 ms scalar roundtrip is noise here
        float(jnp.sum(stepper._step(stepper._state, xv, qd0, fExt)[0]))  # compile
        best_b = float("inf")
        for _ in range(3):
            t0 = time.time()
            float(jnp.sum(stepper._step(stepper._state, xv, qd0, fExt)[0]))
            best_b = min(best_b, time.time() - t0)
        balloon_ms = round(best_b * 1e3, 1)

    print(
        json.dumps(
            {
                "metric": "vcycle_smoother_spmv_throughput",
                "value": round(nnz_per_s / 1e9, 4),
                "unit": "Gnnz/s",
                "vs_baseline": round(nnz_per_s / target, 4),
                "detail": {
                    "device": str(dev),
                    "mesh": f"icosphere |V|={V.shape[0]} |F|={F.shape[0]}",
                    "levels": [lvl.V.shape[0] for lvl in mg],
                    "regime": "vmem_resident",
                    "vs_baseline_note": (
                        "denominator is 0.8x the HBM roofline, which does"
                        " not bind in this regime; HBM-bound point:"
                        " benchmarks/SCALE_HBM_r2.json"
                    ),
                    "t_vcycle_ms": round(t_cycle * 1e3, 3),
                    "t_hierarchy_s": round(t_hier, 2),
                    "t_precompute_s": round(t_pre, 2),
                    "residual_reduction_per_cycle": round(float(resid_rate), 4),
                    "balloon_step_ms": balloon_ms,
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
