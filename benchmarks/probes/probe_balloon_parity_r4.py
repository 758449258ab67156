"""VERDICT r3 item 8: tightened-tolerance balloon Newton-direction parity
at the reference pressure 1e6 (bunny_15K).

The round-3 artifact recorded step-0 direction rel_err 2.65e-2 vs the
PSD-projected f64 direct solve — consistent with mg_tol 2e-1 but not
evidence the projected system is solved ACCURATELY.  Here the same first
Newton direction is solved at mg_tol 1e-5 (f32 multigrid, max 60 cycles)
and compared against scipy spsolve on the f64 host assembly of the same
system

    A = diag(M) + dt^2 K_psd(x0),   g = -dt (grad E(x0) + fExt)

(reference useMG=false analog, 06_example_balloon_sim/main.cpp:128-132;
host K_psd uses models/shell.hessian(psd_project=True), whose f64 path
runs the same accelerated NS schedule through the XLA oracle).
"""
import sys, json
sys.path.insert(0, ".")
import numpy as np


def main():
    import jax, jax.numpy as jnp
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
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
    dt = 1e-3
    al, be = lame_parameters(6e6, 0.5 - 1e-3)
    shell = ShellEnergy(V, F, 1e-1, al, be, "neohookean")
    M = 1000.0 * lumped_mass_matrix(V, F)
    mg = mg_precompute(V, F, verbose=False)
    stepper = BsrBalloonStepper(shell, M, mg, dt, mg_tolerance=1e-5,
                                max_cycles=60)
    Nrm = vertex_normals(V, F)
    Mvd = np.asarray(massmatrix(V, F, kind="voronoi").diagonal())
    fExt3 = -(Nrm * Mvd[:, None]) * 1e6
    Vp, f3 = V, fExt3
    if stepper._vperm is not None:
        Vp = V[stepper._vperm]
        f3 = fExt3[stepper._vperm]
    st = stepper._state
    xv = jnp.asarray(Vp, dtype=stepper.dtype)
    x_flat = xv.reshape(-1)
    fExt = jnp.asarray(f3.reshape(-1), dtype=stepper.dtype)

    # shared rhs, assembled once in f64 on host: g = -dt*(grad E + fExt)
    Gh = shell.gradient(V.reshape(-1))
    gh = -(dt * Gh + dt * fExt3.reshape(-1))
    g3 = gh.reshape(-1, 3)
    if stepper._vperm is not None:
        g3 = g3[stepper._vperm]
    g = jnp.asarray(g3.reshape(-1), dtype=stepper.dtype)

    # MG direction at tol 1e-5
    vals = stepper._block_vals(st, x_flat)
    hier = stepper.solver._refresh_impl(st["solver"], vals)
    dx2, r_his, k = bsr_solve_loop(
        hier, g.reshape(nv, 3), jnp.zeros((nv, 3), dtype=stepper.dtype),
        jnp.asarray(1e-5, stepper.dtype), 60, stepper.solver.cfg)
    dx_mg = np.zeros(3 * nv)
    dxp = np.asarray(dx2, dtype=np.float64).reshape(-1, 3)
    if stepper._vperm is not None:
        tmp = np.empty_like(dxp)
        tmp[stepper._vperm] = dxp
        dxp = tmp
    dx_mg = dxp.reshape(-1)
    r_his = np.asarray(r_his)
    r_last = float(r_his[r_his > 0][-1]) if (r_his > 0).any() else 0.0
    print(f"mg cycles={int(k)} r_last={r_last:.3e}", flush=True)

    # f64 direct on the SAME system (unpermuted original order)
    K = shell.hessian(V.reshape(-1), psd_project=True)
    A = sp.diags(np.asarray(M.diagonal())) + dt * dt * K
    dx_direct = spla.spsolve(A.tocsc(), gh)

    num = np.linalg.norm(dx_mg - dx_direct)
    den = np.linalg.norm(dx_direct)
    cos = float(dx_mg @ dx_direct / (np.linalg.norm(dx_mg) * den))
    out = {
        "pressure": 1e6, "mg_tol": 1e-5, "mg_cycles": int(k),
        "mg_r_last": r_last, "rel_err": float(num / den), "cosine": cos,
        "r3_rel_err_at_tol_2e-1": 0.0265,
    }
    print("RESULT", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
