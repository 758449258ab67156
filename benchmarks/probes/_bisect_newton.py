"""Shared Newton-loop builder for probe_step_bisect stages 12-19.

Parameterized over the (possibly jit-internal) permuted-space tensors so
stages can vary how the loop-invariant curPos0/fExt reach the loop body:
closed-over constants (stage 15), jit arguments (17), or threaded through
the fori carry (19, thread_invariants=True).
"""


def make_run_newton(jax, jnp, stepper, solver, bsr_solve_loop, shell,
                    nv, dtype, cfg, stage, thread_invariants=False,
                    barrier_lam=False, thread_lam=False):
    from surface_multigrid_code_tpu.models.shell import _energy_sum

    dt = 1e-3

    def run_newton(sst, curPos0_in, qdot0, fExt_in, hoist, lam0=None):
        Md = sst["Mdiag"]

        def energy(x_flat):
            bend = None
            if shell.bending:
                bend = (sst["opp"], sst["mask"], sst["bbars"])
            return _energy_sum(
                x_flat, sst["F"], sst["abars"], shell.thickness,
                shell.alpha, shell.beta, shell.material, bend=bend)

        grad_e = jax.grad(energy)

        if lam0 is None and hoist:
            hier0 = solver._refresh_impl(
                sst["solver"],
                stepper._block_vals(sst, curPos0_in.reshape(-1)))
            lam0 = tuple(
                None if lvl.lam_max is None else 1.2 * lvl.lam_max
                for lvl in hier0.levels)
        if barrier_lam and lam0 is not None:
            present = [v for v in lam0 if v is not None]
            present = list(jax.lax.optimization_barrier(tuple(present)))
            lam0 = tuple(
                None if v is None else present.pop(0) for v in lam0)

        lam_present = None
        if thread_lam and lam0 is not None:
            lam_present = tuple(v for v in lam0 if v is not None)

        def newton(i, carry):
            lam = lam0
            if thread_lam and lam_present is not None:
                lam_t = carry[-1]
                it = iter(lam_t)
                lam = tuple(
                    None if v is None else next(it) for v in lam0)
                carry = carry[:-1]
            if thread_invariants:
                qdot, _, curPos0, fExt = carry
            else:
                qdot, _ = carry
                curPos0, fExt = curPos0_in, fExt_in

            def total_energy(qd):
                dq = qd - qdot0
                Ek = 0.5 * (dq * Md * dq).sum()
                newPos = curPos0.reshape(-1) + dt * qd
                return Ek + (newPos * fExt).sum() + energy(newPos)

            x = curPos0.reshape(-1) + dt * qdot
            G = grad_e(x)
            vals = stepper._block_vals(sst, x)
            gg = -(Md * (qdot - qdot0) + dt * G + dt * fExt)
            hier = solver._refresh_impl(sst["solver"], vals, lam_in=lam)
            dx2, _r, _k = bsr_solve_loop(
                hier, gg.reshape(nv, 3), jnp.zeros((nv, 3), dtype=dtype),
                jnp.asarray(2e-1, dtype=dtype), 20, cfg)
            dx = dx2.reshape(-1)
            if stage == 12:
                qdot = qdot + dx
                alpha = carry[1]
            else:
                f0 = total_energy(qdot)
                s = f0 + 1e-8 * (gg * dx).sum()

                def ls_cond(c):
                    a, found = c
                    return jnp.logical_and(~found, a > 1e-8)

                def ls_body(c):
                    a, _ = c
                    ok = total_energy(qdot + a * dx) <= s
                    return (jnp.where(ok, a, a * 0.5), ok)

                alpha, found = jax.lax.while_loop(
                    ls_cond, ls_body,
                    (jnp.asarray(1.0, dtype=dtype), jnp.asarray(False)))
                qdot = qdot + jnp.where(found, alpha, 0.0) * dx
            out = (qdot, alpha)
            if thread_invariants:
                out = out + (curPos0, fExt)
            if thread_lam and lam_present is not None:
                # tiny loop-variant coupling keeps XLA from hoisting the
                # carry slots back out as invariants
                out = out + (tuple(
                    v + 0.0 * jnp.sum(qdot) for v in lam_t),)
            return out

        init = (qdot0, jnp.asarray(1.0, dtype=dtype))
        if thread_invariants:
            init = init + (curPos0_in, fExt_in)
        if thread_lam and lam_present is not None:
            init = init + (lam_present,)
        out = jax.lax.fori_loop(0, 10, newton, init)
        return out[0], out[1]

    return run_newton
