"""BSR balloon V-cycle sub-components: where do the 42 ms/solve go?

Slope-times, on bunny_15K's refreshed BSR hierarchy: one finest bsr_spmv
(row gather + 3x3 einsum), one full bsr_vcycle, the coarse dense apply,
and the solve's residual-history head (cycle count at tol 2e-1).

Usage: python benchmarks/probes/probe_bsr_parts.py
"""
import faulthandler
import json
import sys
import time

faulthandler.dump_traceback_later(600, repeat=True)

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from surface_multigrid_code_tpu.models.balloon import (  # noqa: E402
    BsrBalloonStepper,
    lumped_mass_matrix,
    vertex_normals,
)
from surface_multigrid_code_tpu.models.shell import (  # noqa: E402
    ShellEnergy,
    lame_parameters,
)
from surface_multigrid_code_tpu.ops.laplacian import massmatrix  # noqa: E402
from surface_multigrid_code_tpu.solver.bsr import (  # noqa: E402
    bsr_solve_loop,
    bsr_spmv,
    bsr_vcycle,
)
from surface_multigrid_code_tpu.solver.hierarchy import (  # noqa: E402
    mg_precompute,
)
from surface_multigrid_code_tpu.utils.obj_io import read_obj  # noqa: E402
from surface_multigrid_code_tpu.utils.paths import mesh_path  # noqa: E402


def slope(f, args, klo, khi, reps=4):
    ts = {}
    for K in (klo, khi):
        float(f(*args, jnp.int32(K)))
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            float(f(*args, jnp.int32(K)))
            best = min(best, time.time() - t0)
        ts[K] = best
    return (ts[khi] - ts[klo]) / (khi - klo)


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    V, F = read_obj(mesh_path("bunny_15K_init"))
    nv = V.shape[0]
    al, be = lame_parameters(6e6, 0.5 - 1e-3)
    shell = ShellEnergy(V, F, 1e-1, al, be, "neohookean")
    M = 1000.0 * lumped_mass_matrix(V, F)
    mg = mg_precompute(V, F, verbose=False)
    stepper = BsrBalloonStepper(shell, M, mg, 1e-3, mg_tolerance=2e-1)
    st = stepper._state
    solver = stepper.solver
    cfg = solver.cfg
    dt = jnp.float32

    Nrm = vertex_normals(V, F)
    Mvd = np.asarray(massmatrix(V, F, kind="voronoi").diagonal())
    fExt3 = -(Nrm * Mvd[:, None]) * 1e6
    Vp = V
    if stepper._vperm is not None:
        Vp = V[stepper._vperm]
        fExt3 = fExt3[stepper._vperm]
    x_flat = jnp.asarray(Vp, dtype=dt).reshape(-1)
    vals = stepper._block_vals(st, x_flat)
    hier = jax.jit(solver._refresh_impl)(st["solver"], vals)
    jax.block_until_ready(hier.levels[0].diag)
    g3 = jnp.asarray(
        (-(1e-3) * fExt3).reshape(nv, 3), dtype=dt)

    out = {"levels": [int(l.A.n_rows) for l in hier.levels],
           "widths": [int(l.A.width) for l in hier.levels]}

    def spmv_chain(h, x, K):
        A = h.levels[0].A

        def body(i, x):
            y = bsr_spmv(A, x)
            return y / jnp.sqrt(jnp.mean(y * y) + 1e-30)

        return jnp.sum(jax.lax.fori_loop(0, K, body, x))

    out["bsr_spmv_ms"] = round(
        slope(jax.jit(spmv_chain), (hier, g3), 32, 160) * 1e3, 4)
    print(f"finest bsr_spmv: {out['bsr_spmv_ms']} ms", flush=True)

    def vc_chain(h, b, K):
        def body(i, u):
            u = bsr_vcycle(h, b, u, cfg)
            return u / jnp.sqrt(jnp.mean(u * u) + 1e-30)

        return jnp.sum(jax.lax.fori_loop(0, K, body, jnp.zeros_like(b)))

    out["bsr_vcycle_ms"] = round(
        slope(jax.jit(vc_chain), (hier, g3), 8, 40) * 1e3, 3)
    print(f"bsr_vcycle: {out['bsr_vcycle_ms']} ms", flush=True)

    def coarse_chain(h, b, K):
        cinv = h.coarse_inv
        nc = h.levels[-1].A.n_rows
        b0 = jnp.ones((3 * nc,), dtype=dt)

        def body(i, x):
            y = cinv @ x
            return y / jnp.sqrt(jnp.mean(y * y) + 1e-30)

        return jnp.sum(jax.lax.fori_loop(0, K, body, b0))

    out["coarse_apply_ms"] = round(
        slope(jax.jit(coarse_chain), (hier, g3), 32, 160) * 1e3, 4)

    _dx, r_his, k = bsr_solve_loop(
        hier, g3, jnp.zeros((nv, 3), dtype=dt),
        jnp.asarray(2e-1, dt), 20, cfg)
    k = int(k)
    out["solve_cycles"] = k
    out["r_head"] = [float(r) for r in np.asarray(r_his)[:k][:6]]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
