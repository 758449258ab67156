"""Round-5 long-horizon balloon trajectory at the reference pressure 1e6
(bunny_15K): 25 public steps — finiteness, Newton rejects, per-step max
displacement, and total-system energy — plus a first-5-step inflation
comparison against the direct (sparse-LU, PSD-projected) stepper.
VERDICT r4 item 3: the reference demo runs indefinitely
(06_example_balloon_sim/main.cpp:69-140); this proves the MG stepper's
trajectory stays finite and physical well past the 6 steps recorded in
round 4.  Also validates trajectory parity of the round-5 line-search
restructure (first 6 steps vs TPU_EXAMPLES_r4.json max_disp_per_step).
"""
import sys, json, time
sys.path.insert(0, ".")
import numpy as np

N_STEPS = 25
N_DIRECT = 5


def main(n_steps=str(N_STEPS), n_direct=str(N_DIRECT)):
    import jax, jax.numpy as jnp
    from surface_multigrid_code_tpu.models.balloon import (
        BsrBalloonStepper, implicit_euler_balloon_direct,
        lumped_mass_matrix, vertex_normals)
    from surface_multigrid_code_tpu.models.shell import (
        ShellEnergy, lame_parameters)
    from surface_multigrid_code_tpu.ops.laplacian import massmatrix
    from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute
    from surface_multigrid_code_tpu.utils.obj_io import read_obj
    from surface_multigrid_code_tpu.utils.paths import mesh_path

    n_steps, n_direct = int(n_steps), int(n_direct)
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
    dt = 1e-3

    def total_energy(curPos0, qdot0, qdot):
        Ek = 0.5 * (qdot - qdot0) @ (M @ (qdot - qdot0))
        newPos = curPos0 + dt * qdot.reshape(-1, 3)
        return float(
            newPos.reshape(-1) @ fExt + Ek
            + shell.energy(newPos.reshape(-1))
        )

    curPos = V.copy()
    qdot = np.zeros(3 * nv)
    rejects, disps, energies, times = [], [], [], []
    finite = True
    for k in range(n_steps):
        q_prev, p_prev = qdot.copy(), curPos.copy()
        t0 = time.time()
        newPos, qdot = stepper.step(curPos, qdot, fExt)
        times.append(round(time.time() - t0, 2))
        rejects.append(stepper.last_rejected)
        disps.append(round(float(np.abs(newPos - V).max()), 5))
        energies.append(round(total_energy(p_prev, q_prev, qdot), 3))
        finite = bool(np.isfinite(newPos).all() and np.isfinite(qdot).all())
        print(f"step {k}: finite={finite} rej={rejects[-1]} "
              f"max_disp={disps[-1]} E={energies[-1]} t={times[-1]}s",
              flush=True)
        if not finite:
            break
        curPos = newPos

    # direct-stepper inflation profile over the first n_direct steps
    curD = V.copy()
    qdD = np.zeros(3 * nv)
    disps_direct = []
    for k in range(n_direct):
        curD, qdD = implicit_euler_balloon_direct(
            shell, M, curD, qdD, fExt, dt, verbose=False, psd_project=True)
        disps_direct.append(round(float(np.abs(curD - V).max()), 5))
        print(f"direct step {k}: max_disp={disps_direct[-1]}", flush=True)

    rel = [
        abs(a - b) / max(abs(b), 1e-30)
        for a, b in zip(disps[:n_direct], disps_direct)
    ]
    out = {
        "pressure": 1e6, "dt": dt, "steps_run": len(disps),
        "all_finite": finite, "newton_rejects": rejects,
        "max_disp_per_step": disps, "energy_per_step": energies,
        "wall_s_per_step": times,
        "direct_max_disp_first_steps": disps_direct,
        "mg_vs_direct_rel_disp": [round(r, 4) for r in rel],
    }
    print("RESULT", json.dumps(out), flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
