"""Balloon Newton-iteration cost breakdown on real hardware.

Times the jitted sub-programs of the implicit-Euler balloon step
(models/balloon.py) device-resident — full step, refresh+solve, refresh
alone, energy/gradient, per-face Hessians — so the per-iteration budget
can be attributed (the tunnel's per-dispatch latency makes eager
timings meaningless; every timed unit here is ONE dispatch).
Reference workload: 06_example_balloon_sim/main.cpp:154-201 on
bunny_15K_init (47K DOFs).
"""

import json
import time

import numpy as np


def _time(fn, batches=5, per=3):
    import jax

    fn()  # warm / compile
    best = float("inf")
    for _ in range(batches):
        t0 = time.time()
        for _ in range(per):
            out = fn()
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
            out,
        )
        best = min(best, (time.time() - t0) / per)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from surface_multigrid_code_tpu.models.balloon import (
        DeviceBalloonStepper,
        lumped_mass_matrix,
        vertex_normals,
    )
    from surface_multigrid_code_tpu.models.shell import (
        ShellEnergy,
        lame_parameters,
    )
    from surface_multigrid_code_tpu.ops.laplacian import massmatrix
    from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute_block
    from surface_multigrid_code_tpu.utils.obj_io import read_obj
    from surface_multigrid_code_tpu.utils.paths import mesh_path

    V, F = read_obj(mesh_path("bunny_15K_init"))
    alpha, beta = lame_parameters(6e6, 0.5 - 1e-3)
    shell = ShellEnergy(V, F, 1e-1, alpha, beta, "neohookean")
    M = 1000.0 * lumped_mass_matrix(V, F)
    t0 = time.time()
    mg = mg_precompute_block(V, F, verbose=False)
    t_hier = time.time() - t0
    N = vertex_normals(V, F)
    Mvd = np.asarray(massmatrix(V, F, kind="voronoi").diagonal())
    fExt = (-(N * Mvd[:, None]) * 1e6).reshape(-1)

    dt = 1e-3
    stepper = DeviceBalloonStepper(shell, M, mg, dt, mg_tolerance=2e-1)
    ns = stepper.newton_solver
    dtype = ns.solver.dtype

    x0 = jnp.asarray(V.reshape(-1), dtype=dtype)
    qdot0 = jnp.zeros_like(x0)
    fExt_d = jnp.asarray(fExt, dtype=dtype)
    vals = ns.hessian_values(np.asarray(V.reshape(-1)), dt)
    vals = jax.block_until_ready(jnp.asarray(vals, dtype=dtype))
    g = jnp.asarray(
        -(dt * shell.gradient(V.reshape(-1)) + dt * fExt), dtype=dtype
    )

    xv = jnp.asarray(V, dtype=dtype)
    x9 = jax.block_until_ready(
        xv[jnp.asarray(shell.F)].reshape(-1, 9)
    )

    from surface_multigrid_code_tpu.models.balloon import BsrBalloonStepper
    from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute

    mg_v = mg_precompute(V, F, verbose=False)
    bsr = BsrBalloonStepper(shell, M, mg_v, dt, mg_tolerance=2e-1)
    timings = {
        "full_step_s": _time(
            lambda: stepper._step(
                stepper._state, xv, qdot0, fExt_d
            ),
            batches=3, per=1,
        ),
        "bsr_full_step_s": _time(
            lambda: bsr._step(bsr._state, xv, qdot0, fExt_d),
            batches=3, per=1,
        ),
        "bsr_refresh_plus_solve_s": _time(
            lambda: bsr.solver._solve(
                bsr.solver._state,
                bsr._block_vals(bsr._state, x0),
                g.reshape(-1, 3), jnp.zeros((V.shape[0], 3), dtype=dtype),
                jnp.asarray(2e-1, dtype=dtype), max_iter=20,
            )
        ),
        "refresh_plus_solve_s": _time(
            lambda: ns.solver._solve(
                ns.solver._state, vals, g, jnp.zeros_like(g),
                jnp.asarray(2e-1, dtype=dtype), max_iter=20,
            )
        ),
        "refresh_only_s": _time(
            lambda: ns.solver._refresh(ns.solver._state, vals)
        ),
        "face_hessians_s": _time(lambda: shell._face_hess(x9, shell.abars)),
        "energy_s": _time(lambda: shell._energy(x0)),
        "gradient_s": _time(lambda: shell._grad(x0)),
    }
    print(
        json.dumps(
            {
                "mesh": f"bunny_15K |V|={V.shape[0]} dofs={3 * V.shape[0]}",
                "levels": [lvl.V.shape[0] for lvl in mg],
                "t_hierarchy_s": round(t_hier, 2),
                **{k: round(v, 4) for k, v in timings.items()},
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
