"""Decompose the balloon step's in-program cost by ablation.

The round-4 step is 497 ms = 10 Newton x (assembly ~25 + solve ~2) +
~230 ms of 'glue' (value_and_grad, line-search energy evaluations,
elementwise).  Component slopes measured OUTSIDE the step may not
reflect in-program scheduling, so this probe rebuilds the stepper's
Newton loop from its own internals and times single-dispatch variants:

  full   : replica of BsrBalloonStepper._step (sanity vs 497)
  noLS   : line search replaced by alpha=1 (drops total_energy evals)
  noSolve: noLS with dx = g (drops refresh + V-cycle)
  noAsm  : noLS with vals/hier hoisted out of the Newton loop
  noVG   : noLS with the gradient pass replaced by -fExt (drops val_grad)

Deltas between variants attribute the in-step cost of each piece.
"""
import sys, time, json
sys.path.insert(0, ".")
import numpy as np


def main():
    import jax, jax.numpy as jnp
    from surface_multigrid_code_tpu.models.balloon import (
        BsrBalloonStepper, lumped_mass_matrix, vertex_normals)
    from surface_multigrid_code_tpu.models.shell import (
        ShellEnergy, lame_parameters, _energy_sum)
    from surface_multigrid_code_tpu.ops.laplacian import massmatrix
    from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute
    from surface_multigrid_code_tpu.solver.bsr import bsr_solve_loop
    from surface_multigrid_code_tpu.utils.obj_io import read_obj
    from surface_multigrid_code_tpu.utils.paths import mesh_path

    print("device:", jax.devices()[0], flush=True)
    V, F = read_obj(mesh_path("bunny_15K_init"))
    nv = V.shape[0]
    dt = 1e-3
    al, be = lame_parameters(6e6, 0.5 - 1e-3)
    shell = ShellEnergy(V, F, 1e-1, al, be, "neohookean")
    M = 1000.0 * lumped_mass_matrix(V, F)
    mg = mg_precompute(V, F, verbose=False)
    stepper = BsrBalloonStepper(shell, M, mg, dt, mg_tolerance=2e-1)
    st = stepper._state
    Nrm = vertex_normals(V, F)
    Mvd = np.asarray(massmatrix(V, F, kind="voronoi").diagonal())
    fExt3 = -(Nrm * Mvd[:, None]) * 1e6
    Vp = V
    if stepper._vperm is not None:
        Vp = V[stepper._vperm]
        fExt3 = fExt3[stepper._vperm]
    dtype = stepper.dtype
    fExt = jnp.asarray(fExt3.reshape(-1), dtype=dtype)
    xv = jnp.asarray(Vp, dtype=dtype)
    qd0 = jnp.zeros(3 * nv, dtype=dtype)
    solver = stepper.solver
    cfg = solver.cfg

    def energy(s, x_flat):
        return _energy_sum(
            x_flat, s["F"], s["abars"], shell.thickness, shell.alpha,
            shell.beta, shell.material, bend=None,
        )

    val_grad_e = jax.value_and_grad(energy, argnums=1)

    def make_step(ls=True, solve=True, asm=True, vg=True):
        def step(s, curPos0, qdot0, fE):
            Md = s["Mdiag"]

            def total_energy(qdot):
                dq = qdot - qdot0
                Ek = 0.5 * (dq * Md * dq).sum()
                newPos = curPos0.reshape(-1) + dt * qdot
                return Ek + (newPos * fE).sum() + energy(s, newPos)

            vals0 = stepper._block_vals(s, curPos0.reshape(-1))
            hier0 = solver._refresh_impl(s["solver"], vals0)

            def newton(i, carry):
                qdot, nrej = carry
                x = curPos0.reshape(-1) + dt * qdot
                if vg:
                    Ev0, G = val_grad_e(s, x)
                else:
                    Ev0, G = jnp.asarray(0.0, dtype), -fE
                g = -(Md * (qdot - qdot0) + dt * G + dt * fE)
                if asm:
                    vals = stepper._block_vals(s, x)
                    hier = solver._refresh_impl(s["solver"], vals)
                else:
                    hier = hier0
                if solve:
                    dx2, _r, _k = bsr_solve_loop(
                        hier, g.reshape(nv, 3),
                        jnp.zeros((nv, 3), dtype=dtype),
                        jnp.asarray(2e-1, dtype), 20, cfg)
                    dx = dx2.reshape(-1)
                else:
                    dx = g
                if ls:
                    dq = qdot - qdot0
                    f0 = (0.5 * (dq * Md * dq).sum() + (x * fE).sum()
                          + Ev0)
                    sarm = f0 + 1e-8 * (g * dx).sum()

                    def ls_cond(c):
                        alpha, found = c
                        return jnp.logical_and(~found, alpha > 1e-8)

                    def ls_body(c):
                        alpha, _ = c
                        ok = total_energy(qdot + alpha * dx) <= sarm
                        return (jnp.where(ok, alpha, alpha * 0.5), ok)

                    alpha, found = jax.lax.while_loop(
                        ls_cond, ls_body,
                        (jnp.asarray(1.0, dtype), jnp.asarray(False)))
                    good = jnp.logical_and(
                        found, jnp.isfinite((dx * dx).sum()))
                else:
                    alpha = jnp.asarray(1.0, dtype)
                    good = jnp.isfinite((dx * dx).sum())
                qdot = jnp.where(good, qdot + alpha * dx, qdot)
                return (qdot, nrej + (~good).astype(jnp.int32))

            carry = (qdot0, jnp.int32(0))
            for i in range(10):
                carry = newton(i, carry)
            qdot, nrej = carry
            return curPos0 + dt * qdot.reshape(-1, 3), qdot, nrej

        return jax.jit(step)

    out = {}
    for name, kw in (
        ("full", {}),
        ("noLS", dict(ls=False)),
        ("noSolve", dict(ls=False, solve=False)),
        ("noAsm", dict(ls=False, asm=False)),
        ("noVG", dict(ls=False, vg=False)),
    ):
        f = make_step(**kw)

        def once():
            t0 = time.time()
            float(jnp.sum(f(st, xv, qd0, fExt)[0]))
            return time.time() - t0

        once()
        out[name + "_ms"] = round(min(once() for _ in range(3)) * 1e3, 1)
        print(out, flush=True)
    out["d_linesearch_ms"] = round(out["full_ms"] - out["noLS_ms"], 1)
    out["d_solve_ms"] = round(out["noLS_ms"] - out["noSolve_ms"], 1)
    out["d_asm_ms"] = round(out["noLS_ms"] - out["noAsm_ms"], 1)
    out["d_valgrad_ms"] = round(out["noLS_ms"] - out["noVG_ms"], 1)
    print("RESULT", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
