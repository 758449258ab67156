"""Round-4 balloon trajectory at the reference pressure 1e6 (bunny_15K):
6 public steps, finiteness + rejects + per-step max displacement —
the round-3 TPU_EXAMPLES entry re-driven on the round-4 tree (fused
epilogues + VMEM-resident NS projection).
"""
import sys, json, time
sys.path.insert(0, ".")
import numpy as np


def main():
    import jax, jax.numpy as jnp
    from surface_multigrid_code_tpu.models.balloon import (
        BsrBalloonStepper, lumped_mass_matrix, vertex_normals)
    from surface_multigrid_code_tpu.models.shell import (
        ShellEnergy, lame_parameters)
    from surface_multigrid_code_tpu.ops.laplacian import massmatrix
    from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute
    from surface_multigrid_code_tpu.utils.obj_io import read_obj
    from surface_multigrid_code_tpu.utils.paths import mesh_path

    print("device:", jax.devices()[0], flush=True)
    V, F = read_obj(mesh_path("bunny_15K_init"))
    nv = V.shape[0]
    al, be = lame_parameters(6e6, 0.5 - 1e-3)
    shell = ShellEnergy(V, F, 1e-1, al, be, "neohookean")
    M = 1000.0 * lumped_mass_matrix(V, F)
    mg = mg_precompute(V, F, verbose=False)
    stepper = BsrBalloonStepper(shell, M, mg, 1e-3, mg_tolerance=2e-1)
    Nrm = vertex_normals(V, F)
    Mvd = np.asarray(massmatrix(V, F, kind="voronoi").diagonal())
    fExt = (-(Nrm * Mvd[:, None]) * 1e6).reshape(-1)
    curPos = V.copy()
    qdot = np.zeros(3 * nv)
    rejects, disps, times = [], [], []
    for k in range(6):
        t0 = time.time()
        newPos, qdot = stepper.step(curPos, qdot, fExt)
        times.append(round(time.time() - t0, 2))
        rejects.append(stepper.last_rejected)
        disps.append(round(float(np.abs(newPos - V).max()), 5))
        finite = bool(np.isfinite(newPos).all() and np.isfinite(qdot).all())
        print(f"step {k}: finite={finite} rej={rejects[-1]} "
              f"max_disp={disps[-1]} t={times[-1]}s", flush=True)
        if not finite:
            break
        curPos = newPos
    out = {
        "pressure": 1e6, "steps_run": len(disps), "all_finite": finite,
        "newton_rejects": rejects, "max_disp_per_step": disps,
        "wall_s_per_step": times,
    }
    print("RESULT", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
