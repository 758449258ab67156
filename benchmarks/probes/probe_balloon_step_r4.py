"""Round-4 balloon step: solve + full-step stages of the round-3 profile
(probe_balloon_profile_r3.py methodology) against the round-4 tree
(fused block3 epilogues, VMEM-resident NS projection).
"""
import sys, time, json
sys.path.insert(0, ".")
import numpy as np


def slope_time(f, args, k_lo, k_hi, reps=3):
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
        BsrBalloonStepper, lumped_mass_matrix, vertex_normals)
    from surface_multigrid_code_tpu.models.shell import (
        ShellEnergy, lame_parameters)
    from surface_multigrid_code_tpu.ops.laplacian import massmatrix
    from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute
    from surface_multigrid_code_tpu.solver.bsr import bsr_solve_loop
    from surface_multigrid_code_tpu.utils.obj_io import read_obj
    from surface_multigrid_code_tpu.utils.paths import mesh_path

    print("device:", jax.devices()[0], flush=True)
    V, F = read_obj(mesh_path("bunny_15K_init"))
    nv = V.shape[0]
    al, be = lame_parameters(6e6, 0.5 - 1e-3)
    shell = ShellEnergy(V, F, 1e-1, al, be, "neohookean")
    M = 1000.0 * lumped_mass_matrix(V, F)
    mg = mg_precompute(V, F, verbose=False)
    t0 = time.time()
    stepper = BsrBalloonStepper(shell, M, mg, 1e-3, mg_tolerance=2e-1)
    print(f"stepper build {time.time()-t0:.0f}s", flush=True)
    st = stepper._state
    Nrm = vertex_normals(V, F)
    Mvd = np.asarray(massmatrix(V, F, kind="voronoi").diagonal())
    fExt3 = -(Nrm * Mvd[:, None]) * 1e6
    Vp = V
    if stepper._vperm is not None:
        Vp = V[stepper._vperm]
        fExt3 = fExt3[stepper._vperm]
    fExt = jnp.asarray(fExt3.reshape(-1), dtype=stepper.dtype)
    xv = jnp.asarray(Vp, dtype=stepper.dtype)
    x_flat = xv.reshape(-1)
    qd0 = jnp.zeros(3 * nv, dtype=stepper.dtype)
    out = {}

    # assembly slope (block_vals = face Hessians + PSD projection + scatter)
    def asm_chain(s, x0, K):
        def body(i, x):
            v = stepper._block_vals(s, x)
            return x + 1e-30 * v[:, 0, 0].sum()
        return jnp.sum(jax.lax.fori_loop(0, K, body, x0))

    out["asm_psd_ms"] = round(
        slope_time(jax.jit(asm_chain), (st, x_flat), 2, 8) * 1e3, 2)
    print(f"asm_psd: {out['asm_psd_ms']} ms", flush=True)

    vals = stepper._block_vals(st, x_flat)
    g = -(st["Mdiag"] * qd0 + 1e-3 * fExt)

    def solve_chain(s, v, gg, K):
        hier = stepper.solver._refresh_impl(s, v)

        def body(i, acc):
            dx, _r, kk = bsr_solve_loop(
                hier, gg.reshape(nv, 3) * (1 + 1e-30 * i),
                jnp.zeros((nv, 3), dtype=stepper.dtype),
                jnp.asarray(2e-1, stepper.dtype), 20, stepper.solver.cfg)
            return acc + dx[0, 0] + kk.astype(stepper.dtype)
        return jax.lax.fori_loop(0, K, body,
                                 jnp.asarray(0.0, stepper.dtype))

    out["solve_tol2e-1_ms"] = round(
        slope_time(jax.jit(solve_chain), (st["solver"], vals, g), 2, 8)
        * 1e3, 2)
    hier = stepper.solver._refresh_impl(st["solver"], vals)
    _dx, _r, kk = bsr_solve_loop(
        hier, g.reshape(nv, 3), jnp.zeros((nv, 3), dtype=stepper.dtype),
        jnp.asarray(2e-1, stepper.dtype), 20, stepper.solver.cfg)
    out["solve_cycles"] = int(kk)
    print(f"solve: {out['solve_tol2e-1_ms']} ms, cycles {int(kk)}",
          flush=True)

    def step_once():
        t0 = time.time()
        float(jnp.sum(stepper._step(st, xv, qd0, fExt)[0]))
        return time.time() - t0

    step_once()  # compile
    out["full_step_ms"] = round(min(step_once() for _ in range(3)) * 1e3, 1)
    print(f"full step: {out['full_step_ms']} ms", flush=True)
    print("RESULT", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
