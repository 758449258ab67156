"""Round-4 verify drive: end-to-end on real TPU through the changed paths.

1. ogre Poisson mqwf solve — native SSP engine (optimized LSCM chain,
   boundary cases 1/2) -> hierarchy -> V-cycle solve.
2. bunny balloon BsrBalloonStepper step at pressure 1e5 — fused block3
   smoother epilogues + the new Pallas NS PSD projection.
"""
import sys
sys.path.insert(0, ".")
import numpy as np


def main():
    import jax, jax.numpy as jnp
    print("device:", jax.devices()[0], flush=True)

    from surface_multigrid_code_tpu import (
        mg_precompute, min_quad_with_fixed_mg_precompute,
        min_quad_with_fixed_mg_solve)
    from surface_multigrid_code_tpu.ops.laplacian import cotmatrix, massmatrix
    from surface_multigrid_code_tpu.utils.obj_io import read_obj
    from surface_multigrid_code_tpu.utils.paths import mesh_path
    from surface_multigrid_code_tpu.utils.mesh import (
        normalize_unit_area, boundary_vertices)

    V, F = read_obj(mesh_path("ogre"))
    V = normalize_unit_area(V, F)
    import time
    t0 = time.perf_counter()
    mg = mg_precompute(V, F)
    t1 = time.perf_counter()
    print(f"mg_precompute (native engine): {t1 - t0:.1f} s, "
          f"levels={len(mg)}", flush=True)
    A = (-cotmatrix(V, F)).tocsr()
    b = boundary_vertices(F)
    B = np.asarray(massmatrix(V, F) @ np.ones(V.shape[0]))
    B[b] = 0.0
    data = min_quad_with_fixed_mg_precompute(A, b, mg, dtype=jnp.float32)
    z, r_his, ok = min_quad_with_fixed_mg_solve(
        data, B, known_val=np.zeros(b.size))
    print("ogre poisson r_his:", [f"{r:.3e}" for r in np.asarray(r_his)],
          "converged:", ok, flush=True)
    assert ok, "ogre poisson did not converge"

    # 2. balloon step (block3 fused epilogues + Pallas NS projection)
    from surface_multigrid_code_tpu.models.balloon import (
        BsrBalloonStepper, lumped_mass_matrix, vertex_normals)
    from surface_multigrid_code_tpu.models.shell import (
        ShellEnergy, lame_parameters)
    Vb, Fb = read_obj(mesh_path("bunny_15K_init"))
    al, be = lame_parameters(6e6, 0.5 - 1e-3)
    shell = ShellEnergy(Vb, Fb, 1e-1, al, be, "neohookean")
    M = 1000.0 * lumped_mass_matrix(Vb, Fb)
    mgb = mg_precompute(Vb, Fb, verbose=False)
    stepper = BsrBalloonStepper(shell, M, mgb, 1e-3, mg_tolerance=2e-1,
                                well=True)
    nv = Vb.shape[0]
    Nrm = vertex_normals(Vb, Fb)
    Mvd = np.asarray(massmatrix(Vb, Fb, kind="voronoi").diagonal())
    fExt = (-(Nrm * Mvd[:, None]) * 1e5).reshape(-1)
    t0 = time.perf_counter()
    p1, qd1 = stepper.step(Vb.copy(), np.zeros(3 * nv), fExt)
    t1 = time.perf_counter()
    print(f"balloon step: {t1 - t0:.1f} s  finite="
          f"{np.isfinite(p1).all() and np.isfinite(qd1).all()}  "
          f"rejected={stepper.last_rejected}  "
          f"move={np.abs(p1 - Vb).max():.3e}", flush=True)
    assert np.isfinite(p1).all() and np.isfinite(qd1).all()
    assert stepper.last_rejected == 0
    print("VERIFY OK", flush=True)


if __name__ == "__main__":
    main()
