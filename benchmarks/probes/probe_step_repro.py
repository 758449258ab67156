"""Minimal repro: one BSR balloon step (well refresh) on bunny_15K, TPU."""
import sys, time
sys.path.insert(0, ".")
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from surface_multigrid_code_tpu.models.balloon import (
        BsrBalloonStepper, lumped_mass_matrix, vertex_normals)
    from surface_multigrid_code_tpu.models.shell import ShellEnergy, lame_parameters
    from surface_multigrid_code_tpu.ops.laplacian import massmatrix
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
    print("built; well =", stepper.solver.well, flush=True)
    nv = V.shape[0]
    Nrm = vertex_normals(V, F)
    Mvd = np.asarray(massmatrix(V, F, kind="voronoi").diagonal())
    fExt = jnp.asarray((-(Nrm * Mvd[:, None]) * 1e6).reshape(-1), dtype=stepper.dtype)
    xv = jnp.asarray(V, dtype=stepper.dtype)
    qd0 = jnp.zeros(3 * nv, dtype=stepper.dtype)
    st = stepper._state
    fstep = jax.jit(lambda st, xv, qd0, fExt: jnp.sum(stepper._step(st, xv, qd0, fExt)[0]))
    t0 = time.time()
    r = float(fstep(st, xv, qd0, fExt))
    print("first call ok:", r, "in", round(time.time() - t0, 1), "s", flush=True)
    t0 = time.time()
    r = float(fstep(st, xv, qd0, fExt))
    print("second call:", r, "in", round(time.time() - t0, 2), "s", flush=True)

if __name__ == "__main__":
    main()
