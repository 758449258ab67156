"""Decompose the balloon assembly (block_vals) cost: face Hessians vs
PSD projection vs the gather-based scatter into BSR vertex-pair slots.
"""
import sys, time, json
sys.path.insert(0, ".")
import numpy as np


def slope_time(f, args, k_lo=2, k_hi=8, reps=3):
    ts = {}
    for k in (k_lo, k_hi):
        float(f(*args, k))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args, k))
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    return (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo)


def main():
    import jax, jax.numpy as jnp
    from surface_multigrid_code_tpu.models.balloon import (
        BsrBalloonStepper, lumped_mass_matrix)
    from surface_multigrid_code_tpu.models.shell import (
        ShellEnergy, lame_parameters, psd_project_blocks)
    from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute
    from surface_multigrid_code_tpu.utils.obj_io import read_obj
    from surface_multigrid_code_tpu.utils.paths import mesh_path

    print("device:", jax.devices()[0], flush=True)
    V, F = read_obj(mesh_path("bunny_15K_init"))
    al, be = lame_parameters(6e6, 0.5 - 1e-3)
    shell = ShellEnergy(V, F, 1e-1, al, be, "neohookean")
    M = 1000.0 * lumped_mass_matrix(V, F)
    mg = mg_precompute(V, F, verbose=False)
    stepper = BsrBalloonStepper(shell, M, mg, 1e-3, mg_tolerance=2e-1)
    st = stepper._state
    Vp = V if stepper._vperm is None else V[stepper._vperm]
    x_flat = jnp.asarray(Vp, dtype=stepper.dtype).reshape(-1)
    out = {}

    def hess_only(s, x0, K):
        def body(i, x):
            xv = x.reshape(-1, 3)
            x9 = xv[s["F"]].reshape(-1, 9)
            H9 = shell._face_hess(x9, s["abars"])
            return x + 1e-30 * H9[:, 0, 0].sum()
        return jnp.sum(jax.lax.fori_loop(0, K, body, x0))

    def hess_proj(s, x0, K):
        def body(i, x):
            xv = x.reshape(-1, 3)
            x9 = xv[s["F"]].reshape(-1, 9)
            H9 = psd_project_blocks(shell._face_hess(x9, s["abars"]))
            return x + 1e-30 * H9[:, 0, 0].sum()
        return jnp.sum(jax.lax.fori_loop(0, K, body, x0))

    def full(s, x0, K):
        def body(i, x):
            v = stepper._block_vals(s, x)
            return x + 1e-30 * v[:, 0, 0].sum()
        return jnp.sum(jax.lax.fori_loop(0, K, body, x0))

    out["hess_only_ms"] = round(
        slope_time(jax.jit(hess_only), (st, x_flat), 2, 8) * 1e3, 2)
    print(out, flush=True)
    out["hess_proj_ms"] = round(
        slope_time(jax.jit(hess_proj), (st, x_flat), 2, 8) * 1e3, 2)
    print(out, flush=True)
    out["full_block_vals_ms"] = round(
        slope_time(jax.jit(full), (st, x_flat), 2, 8) * 1e3, 2)
    print("RESULT", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
