"""Bisect the well-refresh balloon-step TPU kernel fault.

Stages (run one per process: a fault kills the worker):
  1 refresh only                      (known good)
  2 refresh + bsr_solve_loop(20)
  3 assembly + refresh + solve (one newton-like iteration, no LS)
  4 full step n_newton=1
  5 full step n_newton=10 (known bad)
  6 full step n_newton=2
  7 fori_loop(0,10) over refresh only (kernels-inside-loop hypothesis)
    -> PASSES (3.3e-26, 2026-08-18): kernels in a lax loop are fine
  8 fori_loop(0,10) over refresh+solve
  9 fori_loop(0,10) over assemble+refresh+solve (newton minus line search)
 10 full step n_newton=10 with newton_unroll=True (no lax While wrapper)
 12 fori_loop(0,10) Newton WITHOUT line search (asm+grad+refresh+solve+update)
 13 stage 12 + backtracking line-search while_loop (newton minus lam hoist)
 14 hoisted refresh OUTSIDE loop + fori_loop(0,10) refresh (dual instantiation)
 15 stage 13 + hoisted lam refresh (full newton composition minus i/o permutes)
 16 stage 15 + input row-permutes and output .at[vp].set scatters (= stage 5)
 17 stage 15 but curPos0/fExt as JIT ARGS instead of closed-over constants
    (stage 16 changed permutes AND args-vs-closure at once; 5 still crashes
    with permutes hoisted to host, so args are the remaining suspect)
 18 stepper._step called directly (no outer jit wrapper), readback via sum
 19 stage 17 but curPos0/fExt threaded through the fori carry (loop-variant)
    -> INTERNAL TPU backend error at runtime: carry-threading doesn't dodge it
 20 stage 17 with hoist=False (args, per-iteration lam power iteration)
 21 stage 17 with lam0 passed as PRECOMPUTED SCALAR args (hoist runs in a
    separate jit dispatch) — the two-dispatch production fix candidate
 22 stage 17 with optimization_barrier around curPos0/fExt args
 23 stage 17 with optimization_barrier on the hoisted lam0 scalars
    (single-dispatch candidate: 17/19/21 crash whenever loop-INVARIANT
    traced lam reaches the in-loop Chebyshev refresh; 20 — loop-computed
    lam — passes; 15 — constant lam — passes)
 24 stage 17 with the hoisted lam scalars THREADED through the fori
    carry (loop-variant lam, single dispatch)
Usage: python probe_step_bisect.py <stage> [mesh=bunny_15K_init]
"""
import sys, time
sys.path.insert(0, ".")
import numpy as np

def main(stage, mesh="bunny_15K_init"):
    import jax, jax.numpy as jnp
    from surface_multigrid_code_tpu.models.balloon import (
        BsrBalloonStepper, lumped_mass_matrix, vertex_normals)
    from surface_multigrid_code_tpu.models.shell import ShellEnergy, lame_parameters
    from surface_multigrid_code_tpu.ops.laplacian import massmatrix
    from surface_multigrid_code_tpu.solver.bsr import bsr_solve_loop
    from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute
    from surface_multigrid_code_tpu.utils.obj_io import read_obj
    from surface_multigrid_code_tpu.utils.paths import mesh_path
    print("device:", jax.devices()[0], "stage:", stage, "mesh:", mesh,
          flush=True)
    V, F = read_obj(mesh_path(mesh))
    al, be = lame_parameters(6e6, 0.5 - 1e-3)
    shell = ShellEnergy(V, F, 1e-1, al, be, "neohookean")
    M = 1000.0 * lumped_mass_matrix(V, F)
    mg = mg_precompute(V, F, verbose=False)
    n_newton = {4: 1, 6: 2}.get(stage, 10)
    stepper = BsrBalloonStepper(shell, M, mg, 1e-3, mg_tolerance=2e-1,
                                n_newton=n_newton,
                                newton_unroll=(stage == 10))
    st = stepper._state
    solver = stepper.solver
    dtype = stepper.dtype
    nv = V.shape[0]
    Nrm = vertex_normals(V, F)
    Mvd = np.asarray(massmatrix(V, F, kind="voronoi").diagonal())
    fExt = jnp.asarray((-(Nrm * Mvd[:, None]) * 1e6).reshape(-1), dtype=dtype)
    xv = jnp.asarray(V, dtype=dtype)
    qd0 = jnp.zeros(3 * nv, dtype=dtype)
    # _block_vals expects positions in the stepper's (well-permuted)
    # vertex order — feeding the raw V scrambles the geometry and makes
    # the "Hessian" indefinite (the round-2 probe nan artifact)
    Vp = V if stepper._vperm is None else V[stepper._vperm]
    x0 = jnp.asarray(Vp.reshape(-1), dtype=dtype)
    cfg = solver.cfg

    if stage == 1:
        f = jax.jit(lambda sst, v: jnp.sum(
            solver._refresh_impl(sst, v).coarse_inv))
        vals0 = jax.jit(stepper._block_vals)(st, x0)
        print("got vals", flush=True)
        r = float(f(st["solver"], vals0)); print("refresh ok", r, flush=True)
    elif stage == 2:
        vals0 = jax.jit(stepper._block_vals)(st, x0)
        def g(sst, v, rhs):
            hier = solver._refresh_impl(sst, v)
            z, r_his, k = bsr_solve_loop(
                hier, rhs, jnp.zeros_like(rhs),
                jnp.asarray(0.0, dtype=dtype), 20, cfg)
            return jnp.sum(z)
        f = jax.jit(g)
        rhs = jnp.asarray(np.random.default_rng(0).standard_normal(
            (nv, 3)), dtype=dtype)
        r = float(f(st["solver"], vals0, rhs))
        print("refresh+solve ok", r, flush=True)
    elif stage == 3:
        def g(sst, x, rhs):
            vals = stepper._block_vals(sst, x)
            hier = solver._refresh_impl(sst["solver"], vals)
            z, r_his, k = bsr_solve_loop(
                hier, rhs, jnp.zeros_like(rhs),
                jnp.asarray(0.0, dtype=dtype), 20, cfg)
            return jnp.sum(z)
        f = jax.jit(g)
        rhs = jnp.asarray(np.random.default_rng(0).standard_normal(
            (nv, 3)), dtype=dtype)
        r = float(f(st, x0, rhs))
        print("asm+refresh+solve ok", r, flush=True)
    elif stage == 7:
        vals0 = jax.jit(stepper._block_vals)(st, x0)

        def g(sst, v):
            def body(i, acc):
                # acc-coupling keeps the body loop-variant (no hoisting)
                hier = solver._refresh_impl(sst, v + acc * 1e-30)
                return acc + jnp.sum(hier.coarse_inv) * 1e-30
            return jax.lax.fori_loop(
                0, 10, body, jnp.asarray(0.0, dtype=dtype))
        r = float(jax.jit(g)(st["solver"], vals0))
        print("looped refresh ok", r, flush=True)
    elif stage == 8:
        vals0 = jax.jit(stepper._block_vals)(st, x0)
        rhs = jnp.asarray(np.random.default_rng(0).standard_normal(
            (nv, 3)), dtype=dtype)

        def g(sst, v, rhs):
            def body(i, acc):
                hier = solver._refresh_impl(sst, v + acc * 1e-30)
                z, r_his, k = bsr_solve_loop(
                    hier, rhs, jnp.zeros_like(rhs),
                    jnp.asarray(0.0, dtype=dtype), 20, cfg)
                return acc + jnp.sum(z) * 1e-30
            return jax.lax.fori_loop(
                0, 10, body, jnp.asarray(0.0, dtype=dtype))
        r = float(jax.jit(g)(st["solver"], vals0, rhs))
        print("looped refresh+solve ok", r, flush=True)
    elif stage == 9:
        rhs = jnp.asarray(np.random.default_rng(0).standard_normal(
            (nv, 3)), dtype=dtype)

        def g(sst, x0, rhs):
            def body(i, carry):
                x, acc = carry
                vals = stepper._block_vals(sst, x)
                hier = solver._refresh_impl(sst["solver"], vals)
                z, r_his, k = bsr_solve_loop(
                    hier, rhs, jnp.zeros_like(rhs),
                    jnp.asarray(0.0, dtype=dtype), 20, cfg)
                return (x + 1e-30 * z.reshape(-1), acc + jnp.sum(z) * 1e-30)
            _, acc = jax.lax.fori_loop(
                0, 10, body, (x0, jnp.asarray(0.0, dtype=dtype)))
            return acc
        r = float(jax.jit(g)(st, x0, rhs))
        print("looped asm+refresh+solve ok", r, flush=True)
    elif stage in (12, 13, 15, 16, 17, 19, 20, 21, 22, 23, 24):
        from _bisect_newton import make_run_newton

        dt = 1e-3
        run_newton = make_run_newton(
            jax, jnp, stepper, solver, bsr_solve_loop, shell, nv, dtype,
            cfg, stage, barrier_lam=(stage == 23),
            thread_lam=(stage == 24))

        if stage in (17, 20, 21, 22, 23, 24):
            lam_args = None
            if stage == 21:
                # hoist in a SEPARATE dispatch; pass scalars as args
                def lamf(sst, curPos0):
                    hier0 = solver._refresh_impl(
                        sst["solver"],
                        stepper._block_vals(sst, curPos0.reshape(-1)))
                    return tuple(
                        jnp.asarray(0.0, dtype)
                        if lvl.lam_max is None else 1.2 * lvl.lam_max
                        for lvl in hier0.levels)
                lam_args = jax.jit(lamf)(st, jnp.asarray(Vp, dtype=dtype))
                lam_args = tuple(
                    None if i == len(lam_args) - 1 else v
                    for i, v in enumerate(lam_args))
                print("lam dispatch done", flush=True)

            def g(sst, qdot0, curPos0, fExt, lam0=None):
                if stage == 22:
                    curPos0, fExt = jax.lax.optimization_barrier(
                        (curPos0, fExt))
                qdot, _ = run_newton(sst, curPos0, qdot0, fExt,
                                     hoist=(stage in (17, 22, 23, 24)),
                                     lam0=lam0)
                return jnp.sum(qdot)
            fEp = jnp.asarray(
                np.asarray(fExt).reshape(-1, 3)[stepper._vperm]
                .reshape(-1), dtype=dtype) if stepper._vperm is not None \
                else fExt
            r = float(jax.jit(g, static_argnames=())(
                st, qd0, jnp.asarray(Vp, dtype=dtype), fEp, lam_args))
        elif stage == 19:
            run_newton19 = make_run_newton(
                jax, jnp, stepper, solver, bsr_solve_loop, shell, nv,
                dtype, cfg, stage, thread_invariants=True)

            def g(sst, qdot0, curPos0, fExt):
                qdot, _ = run_newton19(sst, curPos0, qdot0, fExt,
                                       hoist=True)
                return jnp.sum(qdot)
            fEp = jnp.asarray(
                np.asarray(fExt).reshape(-1, 3)[stepper._vperm]
                .reshape(-1), dtype=dtype) if stepper._vperm is not None \
                else fExt
            r = float(jax.jit(g)(
                st, qd0, jnp.asarray(Vp, dtype=dtype), fEp))
        elif stage == 16:
            # mirror _step exactly: unpermuted args, permute inside jit
            def g(sst, curPos0u, qdot0u, fExtu):
                vp = sst["vperm"]
                curPos0 = curPos0u[vp]
                qdot0 = qdot0u.reshape(-1, 3)[vp].reshape(-1)
                fExtp = fExtu.reshape(-1, 3)[vp].reshape(-1)
                qdot, _ = run_newton(sst, curPos0, qdot0, fExtp,
                                     hoist=True)
                curPos = curPos0 + dt * qdot.reshape(-1, 3)
                curPos = jnp.zeros_like(curPos).at[vp].set(curPos)
                qdot = (jnp.zeros_like(curPos).at[vp]
                        .set(qdot.reshape(-1, 3))).reshape(-1)
                return jnp.sum(curPos) + jnp.sum(qdot) * 1e-30
            r = float(jax.jit(g)(st, xv, qd0, fExt))
        else:
            curPos0 = jnp.asarray(Vp, dtype=dtype)

            def g(sst, qdot0):
                qdot, _ = run_newton(sst, curPos0, qdot0, fExt,
                                     hoist=(stage == 15))
                return jnp.sum(qdot)
            r = float(jax.jit(g)(st, qd0))
        print(f"stage {stage} newton loop ok", r, flush=True)
    elif stage == 14:
        vals0 = jax.jit(stepper._block_vals)(st, x0)

        def g(sst, v):
            hier0 = solver._refresh_impl(sst, v)
            lead = jnp.sum(hier0.coarse_inv) * 1e-30

            def body(i, acc):
                hier = solver._refresh_impl(sst, v + acc * 1e-30)
                return acc + jnp.sum(hier.coarse_inv) * 1e-30
            return jax.lax.fori_loop(0, 10, body, lead)
        r = float(jax.jit(g)(st["solver"], vals0))
        print("hoist+looped refresh ok", r, flush=True)
    elif stage in (4, 5, 6, 10):
        # post-fix _step runs in PERMUTED space: feed permuted inputs
        # (stage 5 is the regression check for the stage-16 fault)
        vperm = stepper._vperm
        xvp = jnp.asarray(Vp, dtype=dtype)
        fE = fExt if vperm is None else jnp.asarray(
            np.asarray(fExt).reshape(-1, 3)[vperm].reshape(-1),
            dtype=dtype)
        f = jax.jit(lambda st, xv, qd0, fExt: jnp.sum(
            stepper._step(st, xv, qd0, fExt)[0]))
        r = float(f(st, xvp, qd0, fE))
        print("step ok", r, flush=True)

if __name__ == "__main__":
    main(int(sys.argv[1]), *sys.argv[2:])
