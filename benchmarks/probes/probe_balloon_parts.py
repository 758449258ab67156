"""Readback-forced slope timing of the BSR balloon step's components.

PROFILE_BALLOON_r2.json's sub-component numbers were taken with
block_until_ready, which the axon tunnel does not honor — only the
full-step number (one dispatch, seconds-scale) is trustworthy there.
This probe re-attributes the per-Newton budget honestly: each component
is wrapped in a data-dependent chained fori_loop, jitted with a traced
iteration count, and timed as the SLOPE between two counts (cancels the
~29 ms scalar roundtrip + dispatch constant).

Components: block Hessian assembly (face hessians + gather-assembly),
Galerkin block refresh (+ dense coarse inverse), V-cycles at fixed
hierarchy (per-cycle slope), total_energy (one line-search probe), and
the energy gradient.

Run fresh on TPU: python benchmarks/probes/probe_balloon_parts.py
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def slope(f, k_lo, k_hi, reps=4):
    """f(k) -> scalar; returns seconds per unit k."""
    t = {}
    for k in (k_lo, k_hi):
        float(f(k))  # compile/warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            float(f(k))
            best = min(best, time.time() - t0)
        t[k] = best
    return (t[k_hi] - t[k_lo]) / (k_hi - k_lo)


def main():
    import jax
    import jax.numpy as jnp

    from surface_multigrid_code_tpu.config import SolveConfig, SmootherType
    from surface_multigrid_code_tpu.models.balloon import (
        BsrBalloonStepper,
        lumped_mass_matrix,
        vertex_normals,
    )
    from surface_multigrid_code_tpu.models.shell import (
        ShellEnergy,
        lame_parameters,
    )
    from surface_multigrid_code_tpu.ops.laplacian import massmatrix
    from surface_multigrid_code_tpu.solver.bsr import bsr_solve_loop
    from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute
    from surface_multigrid_code_tpu.utils.obj_io import read_obj
    from surface_multigrid_code_tpu.utils.paths import mesh_path

    print(f"device: {jax.devices()[0]}", flush=True)
    V, F = read_obj(mesh_path("bunny_15K_init"))
    al, be = lame_parameters(6e6, 0.5 - 1e-3)
    shell = ShellEnergy(V, F, 1e-1, al, be, "neohookean")
    M = 1000.0 * lumped_mass_matrix(V, F)
    mg = mg_precompute(V, F, verbose=False)
    stepper = BsrBalloonStepper(shell, M, mg, 1e-3, mg_tolerance=2e-1)
    st = stepper._state
    solver = stepper.solver
    dtype = stepper.dtype
    nv = V.shape[0]
    x0 = jnp.asarray(V.reshape(-1), dtype=dtype)
    out = {"mesh": f"bunny_15K |V|={nv}"}

    # --- full step (reference semantics; one dispatch) ------------------
    Nrm = vertex_normals(V, F)
    Mvd = np.asarray(massmatrix(V, F, kind="voronoi").diagonal())
    fExt = jnp.asarray((-(Nrm * Mvd[:, None]) * 1e6).reshape(-1), dtype=dtype)
    xv = jnp.asarray(V, dtype=dtype)
    qd0 = jnp.zeros(3 * nv, dtype=dtype)
    fstep = jax.jit(
        lambda st, xv, qd0, fExt: jnp.sum(stepper._step(st, xv, qd0, fExt)[0])
    )
    float(fstep(st, xv, qd0, fExt))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(fstep(st, xv, qd0, fExt))
        best = min(best, time.time() - t0)
    out["full_step_s"] = round(best, 4)

    # --- block Hessian assembly -----------------------------------------
    bv = stepper._block_vals

    @jax.jit
    def asm_k(st, x, k):
        def body(i, xx):
            vals = bv(st, xx)
            return xx + 0.0 * jnp.sum(vals) + 0.0 * i
        return jnp.sum(jax.lax.fori_loop(0, k, body, x))

    out["block_vals_ms"] = round(
        slope(lambda k: asm_k(st, x0, jnp.asarray(k)), 4, 16) * 1e3, 2)

    # --- refresh (values -> hierarchy incl. dense coarse inverse) -------
    vals0 = jax.jit(lambda st, x: bv(st, x))(st, x0)

    @jax.jit
    def refresh_k(sst, vals, k):
        def body(i, v):
            hier = solver._refresh_impl(sst, v)
            return v + 0.0 * hier.coarse_inv[0, 0] + 0.0 * i
        return jnp.sum(jax.lax.fori_loop(0, k, body, vals))

    out["refresh_ms"] = round(
        slope(lambda k: refresh_k(st["solver"], vals0, jnp.asarray(k)),
              2, 8) * 1e3, 2)

    # refresh with the Chebyshev lam_max hoisted (what 10 of the 11
    # per-step refreshes actually run — the step reuses lam from the
    # first refresh, models/balloon.py)
    hier_l = jax.jit(
        lambda sst, v: solver._refresh_impl(sst, v)
    )(st["solver"], vals0)
    lam0 = tuple(
        None if lvl.lam_max is None else 1.2 * lvl.lam_max
        for lvl in hier_l.levels
    )

    @jax.jit
    def refresh_lam_k(sst, lam, vals, k):
        def body(i, v):
            hier = solver._refresh_impl(sst, v, lam_in=lam)
            return v + 0.0 * hier.coarse_inv[0, 0] + 0.0 * i
        return jnp.sum(jax.lax.fori_loop(0, k, body, vals))

    out["refresh_hoisted_ms"] = round(
        slope(lambda k: refresh_lam_k(st["solver"], lam0, vals0,
                                      jnp.asarray(k)), 2, 8) * 1e3, 2)

    # --- V-cycles at fixed hierarchy (per-cycle slope) -------------------
    hier0 = jax.jit(
        lambda sst, v: solver._refresh_impl(sst, v)
    )(st["solver"], vals0)
    jax.block_until_ready(hier0.coarse_inv)
    g = jnp.asarray(np.random.default_rng(0).standard_normal((nv, 3)),
                    dtype=dtype)
    cfg = solver.cfg
    tol0 = jnp.asarray(0.0, dtype=dtype)
    t_at = {}
    for n in (4, 16):
        fn = jax.jit(lambda h, g, z, t, n=n: jnp.sum(
            bsr_solve_loop(h, g, z, t, n, cfg)[0]))
        z00 = jnp.zeros_like(g)
        float(fn(hier0, g, z00, tol0))
        best = float("inf")
        for _ in range(4):
            t0 = time.time()
            float(fn(hier0, g, z00, tol0))
            best = min(best, time.time() - t0)
        t_at[n] = best
    out["vcycle_ms"] = round((t_at[16] - t_at[4]) / 12 * 1e3, 2)

    # --- total_energy (line-search probe) --------------------------------
    from surface_multigrid_code_tpu.models.shell import _energy_sum

    def energy(xx):
        bend = None
        if shell.bending:
            bend = (st["opp"], st["mask"], st["bbars"])
        return _energy_sum(xx, st["F"], st["abars"], shell.thickness,
                           shell.alpha, shell.beta, shell.material,
                           bend=bend)

    def energy_st(sst, xx):
        bend = None
        if shell.bending:
            bend = (sst["opp"], sst["mask"], sst["bbars"])
        return _energy_sum(xx, sst["F"], sst["abars"], shell.thickness,
                           shell.alpha, shell.beta, shell.material,
                           bend=bend)

    @jax.jit
    def energy_k(sst, x, k):
        def body(i, xx):
            return xx + 0.0 * energy_st(sst, xx) + 0.0 * i
        return jnp.sum(jax.lax.fori_loop(0, k, body, x))

    out["energy_ms"] = round(
        slope(lambda k: energy_k(st, x0, jnp.asarray(k)), 8, 32) * 1e3, 2)

    @jax.jit
    def grad_k(sst, x, k):
        ge = jax.grad(lambda xx: energy_st(sst, xx))

        def body(i, xx):
            return xx + 0.0 * jnp.sum(ge(xx)) + 0.0 * i
        return jnp.sum(jax.lax.fori_loop(0, k, body, x))

    out["gradient_ms"] = round(
        slope(lambda k: grad_k(st, x0, jnp.asarray(k)), 8, 32) * 1e3, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
