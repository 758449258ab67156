"""Shared Newton-loop builder for probe_step_bisect stages 12/13/15/16.

Parameterized over the (possibly jit-internal) permuted-space tensors so
stage 16 can derive them from unpermuted args exactly like
BsrBalloonStepper._step does.
"""


def make_run_newton(jax, jnp, stepper, solver, bsr_solve_loop, shell,
                    nv, dtype, cfg, stage):
    from surface_multigrid_code_tpu.models.shell import _energy_sum

    dt = 1e-3

    def run_newton(sst, curPos0, qdot0, fExt, hoist):
        Md = sst["Mdiag"]

        def energy(x_flat):
            bend = None
            if shell.bending:
                bend = (sst["opp"], sst["mask"], sst["bbars"])
            return _energy_sum(
                x_flat, sst["F"], sst["abars"], shell.thickness,
                shell.alpha, shell.beta, shell.material, bend=bend)

        grad_e = jax.grad(energy)

        def total_energy(qdot):
            dq = qdot - qdot0
            Ek = 0.5 * (dq * Md * dq).sum()
            newPos = curPos0.reshape(-1) + dt * qdot
            return Ek + (newPos * fExt).sum() + energy(newPos)

        lam0 = None
        if hoist:
            hier0 = solver._refresh_impl(
                sst["solver"],
                stepper._block_vals(sst, curPos0.reshape(-1)))
            lam0 = tuple(
                None if lvl.lam_max is None else 1.2 * lvl.lam_max
                for lvl in hier0.levels)

        def newton(i, carry):
            qdot, _ = carry
            x = curPos0.reshape(-1) + dt * qdot
            G = grad_e(x)
            vals = stepper._block_vals(sst, x)
            gg = -(Md * (qdot - qdot0) + dt * G + dt * fExt)
            hier = solver._refresh_impl(sst["solver"], vals, lam_in=lam0)
            dx2, _r, _k = bsr_solve_loop(
                hier, gg.reshape(nv, 3), jnp.zeros((nv, 3), dtype=dtype),
                jnp.asarray(2e-1, dtype=dtype), 20, cfg)
            dx = dx2.reshape(-1)
            if stage == 12:
                return (qdot + dx, carry[1])
            f0 = total_energy(qdot)
            s = f0 + 1e-8 * (gg * dx).sum()

            def ls_cond(c):
                alpha, found = c
                return jnp.logical_and(~found, alpha > 1e-8)

            def ls_body(c):
                alpha, _ = c
                ok = total_energy(qdot + alpha * dx) <= s
                return (jnp.where(ok, alpha, alpha * 0.5), ok)

            alpha, found = jax.lax.while_loop(
                ls_cond, ls_body,
                (jnp.asarray(1.0, dtype=dtype), jnp.asarray(False)))
            qdot = qdot + jnp.where(found, alpha, 0.0) * dx
            return (qdot, alpha)

        return jax.lax.fori_loop(
            0, 10, newton, (qdot0, jnp.asarray(1.0, dtype=dtype)))

    return run_newton
