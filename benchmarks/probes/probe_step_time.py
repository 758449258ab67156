"""Time the BSR balloon implicit-Euler step (10 Newton) on the chip.

Readback-forced slope methodology (CLAUDE.md): jit a scalar out of K
CHAINED steps, time float(...) at two K values, report the slope — this
cancels the ~29 ms scalar-roundtrip + dispatch overhead and defeats the
axon block_until_ready lie.

Usage: python probe_step_time.py [well={1,0}] [mesh=bunny_15K_init] [scale]

`scale` is the pressure-force multiplier; the default 1e6 blows the f32
trajectory up by step ~2-3 (nan), which corrupts chained-step slopes by
changing line-search while_loop trip counts — use ~1e5 for k>1 chains.
"""
import sys, time
sys.path.insert(0, ".")
import numpy as np


def main(well="1", mesh="bunny_15K_init", scale="1e6", nc="500", pits="12"):
    import jax, jax.numpy as jnp
    from surface_multigrid_code_tpu.models.balloon import (
        BsrBalloonStepper, lumped_mass_matrix, vertex_normals)
    from surface_multigrid_code_tpu.models.shell import (
        ShellEnergy, lame_parameters)
    from surface_multigrid_code_tpu.ops.laplacian import massmatrix
    from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute
    from surface_multigrid_code_tpu.utils.obj_io import read_obj
    from surface_multigrid_code_tpu.utils.paths import mesh_path

    well = bool(int(well))
    print("device:", jax.devices()[0], "well:", well, "mesh:", mesh,
          flush=True)
    V, F = read_obj(mesh_path(mesh))
    al, be = lame_parameters(6e6, 0.5 - 1e-3)
    shell = ShellEnergy(V, F, 1e-1, al, be, "neohookean")
    M = 1000.0 * lumped_mass_matrix(V, F)
    mg = mg_precompute(V, F, min_coarsest_nv=int(nc), verbose=False)
    print("levels:", [mg[l].V.shape[0] for l in range(len(mg))], flush=True)
    from surface_multigrid_code_tpu.config import SolveConfig, SmootherType
    cfg = SolveConfig(smoother=SmootherType.CHEBYSHEV,
                      lam_power_iters=int(pits))
    stepper = BsrBalloonStepper(shell, M, mg, 1e-3, mg_tolerance=2e-1,
                                well=well, cfg=cfg)
    nv = V.shape[0]
    Nrm = vertex_normals(V, F)
    Mvd = np.asarray(massmatrix(V, F, kind="voronoi").diagonal())
    fExt3 = -(Nrm * Mvd[:, None]) * float(scale)
    Vp = V
    # the private jitted _step runs ENTIRELY in the solver's permuted
    # vertex order (well mode); unpermuted inputs evaluate the Hessian on
    # scrambled geometry -> indefinite matrix -> Chebyshev nan, which
    # changes line-search while_loop trip counts and corrupts the timing
    # (CLAUDE.md round-2 notes).
    if stepper._vperm is not None:
        Vp = V[stepper._vperm]
        fExt3 = fExt3[stepper._vperm]
    fExt = jnp.asarray(fExt3.reshape(-1), dtype=stepper.dtype)
    xv = jnp.asarray(Vp, dtype=stepper.dtype)
    qd0 = jnp.zeros(3 * nv, dtype=stepper.dtype)
    st = stepper._state

    def chain(k):
        def f(st, xv, qd0, fExt):
            def body(c, _):
                p, q = stepper._step(st, c[0], c[1], fExt)[:2]
                return (p, q), None
            (p, q), _ = jax.lax.scan(body, (xv, qd0), None, length=k)
            return jnp.sum(p) + jnp.sum(q) * 1e-30
        return jax.jit(f)

    for k in (1, 3):
        f = chain(k)
        t0 = time.time()
        r = float(f(st, xv, qd0, fExt))
        print(f"k={k} first (compile+run): {time.time()-t0:.1f}s "
              f"val={r}", flush=True)
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(f(st, xv, qd0, fExt))
            ts.append(time.time() - t0)
        print(f"k={k} hot: {min(ts)*1e3:.1f} ms", flush=True)
        if k == 1:
            t1 = min(ts)
        else:
            tk = min(ts)
    print(f"slope step time: {(tk - t1) / 2 * 1e3:.1f} ms/step",
          flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
