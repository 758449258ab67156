"""Round-5 in-step ablation of the balloon step (single-dispatch
variants of the stepper's own Newton loop; methodology of the round-4
probe_step_glue.py).  The replica's line search is the ROUND-5
pre-gathered line form (models/balloon.py: face states of x and dx
gathered once per Newton through the windowed corner-gather operator,
each backtracking trial pure per-face flops); `oldLS` swaps back the
round-4 per-trial gather-bound total_energy pass to attribute the
line-search restructure's in-program saving.

  full   : replica of the round-5 BsrBalloonStepper._step
  oldLS  : round-4 line search (full vmapped energy pass per trial)
  noLS   : line search replaced by alpha=1
  noSolve: noLS with dx = g (drops refresh + V-cycle)
  noAsm  : noLS with vals/hier hoisted out of the Newton loop
  noVG   : noLS with the gradient pass replaced by -fExt
"""
import sys, time, json
sys.path.insert(0, ".")
import numpy as np


def main():
    import jax, jax.numpy as jnp
    from surface_multigrid_code_tpu.models.balloon import (
        BsrBalloonStepper, lumped_mass_matrix, vertex_normals)
    from surface_multigrid_code_tpu.models.shell import (
        ShellEnergy, face_energy, lame_parameters, _energy_sum)
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
    nf = F.shape[0]

    def face9(s, v_flat):
        if "gat_Ws" in s:
            from surface_multigrid_code_tpu.ops.well import well_apply

            out9 = well_apply(s["gat_Ws"], v_flat.reshape(-1, 3).T)
            return (out9.reshape(3, nf, 3).transpose(1, 2, 0)
                    .reshape(nf, 9).astype(v_flat.dtype))
        return v_flat.reshape(-1, 3)[s["F"]].reshape(nf, 9)

    def make_step(ls="new", solve=True, asm=True, vg=True):
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

                    if ls == "new":
                        x9 = face9(s, x)
                        d9 = face9(s, dx)

                        def line_energy(alpha):
                            qd = qdot + alpha * dx
                            dqa = qd - qdot0
                            Ek = 0.5 * (dqa * Md * dqa).sum()
                            newPos = curPos0.reshape(-1) + dt * qd
                            e9 = x9 + (alpha * dt) * d9
                            ev = jax.vmap(
                                lambda a, b: face_energy(
                                    a, b, shell.thickness, shell.alpha,
                                    shell.beta, shell.material)
                            )(e9, s["abars"]).sum()
                            return Ek + (newPos * fE).sum() + ev
                    else:
                        def line_energy(alpha):
                            return total_energy(qdot + alpha * dx)

                    def ls_cond(c):
                        alpha, found = c
                        return jnp.logical_and(~found, alpha > 1e-8)

                    def ls_body(c):
                        alpha, _ = c
                        ok = line_energy(alpha) <= sarm
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
        ("oldLS", dict(ls="old")),
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
    out["d_linesearch_old_ms"] = round(out["oldLS_ms"] - out["noLS_ms"], 1)
    out["d_solve_ms"] = round(out["noLS_ms"] - out["noSolve_ms"], 1)
    out["d_asm_ms"] = round(out["noLS_ms"] - out["noAsm_ms"], 1)
    out["d_valgrad_ms"] = round(out["noLS_ms"] - out["noVG_ms"], 1)
    print("RESULT", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
