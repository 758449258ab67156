"""Honest flagship V-cycle timing with the windowed Pallas kernel path."""
import time
import numpy as np
import jax, jax.numpy as jnp

from surface_multigrid_code_tpu.config import SolveConfig, SmootherType
from surface_multigrid_code_tpu.ops.laplacian import cotmatrix, massmatrix
from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute
from surface_multigrid_code_tpu.solver.mqwf_mg import min_quad_with_fixed_mg_precompute
from surface_multigrid_code_tpu.solver.vcycle import solve_loop
from surface_multigrid_code_tpu.utils.synthetic import icosphere

print(f"device: {jax.devices()[0]}", flush=True)
V, F = icosphere(7)
mg = mg_precompute(V, F, verbose=False)
A = (massmatrix(V, F) - 0.01 * cotmatrix(V, F)).tocsr()
rhs = np.asarray(massmatrix(V, F) @ V[:, 0])
cfg = SolveConfig(smoother=SmootherType.JACOBI)
t0 = time.time()
data = min_quad_with_fixed_mg_precompute(A, None, mg, cfg=cfg, dtype=jnp.float32, well=True)
print(f"precompute(well) {time.time()-t0:.1f}s  Hs="
      f"{[tuple(w.H for w in l.Aw) for l in data.hier.levels]}", flush=True)

rhs_p = rhs[data.perm]
rhs_d = jax.device_put(jnp.asarray(rhs_p, dtype=jnp.float32))
z0 = jnp.zeros_like(rhs_d)
tol_d = jnp.asarray(0.0, dtype=jnp.float32)
times = {}
for n_cyc in (8, 40):
    f = jax.jit(lambda h, b, z, t, n=n_cyc: jnp.sum(solve_loop(h, b, z, t, n, cfg)[0]))
    t0 = time.time(); s = float(f(data.hier, rhs_d, z0, tol_d)); tc = time.time() - t0
    best = float("inf")
    for _ in range(5):
        t0 = time.time(); s = float(f(data.hier, rhs_d, z0, tol_d)); best = min(best, time.time() - t0)
    times[n_cyc] = best
    print(f"n_cyc={n_cyc}: compile+1st {tc:.1f}s best {best*1e3:.2f} ms chk {s:.6e}", flush=True)
per = (times[40] - times[8]) / 32.0
print(f"WELL V-cycle per-cycle (slope): {per*1e3:.3f} ms  (was 129.99 ms ELL)", flush=True)

# convergence sanity on device
out = solve_loop(data.hier, rhs_d, z0, jnp.asarray(1e-6, jnp.float32), 12, cfg)
k = int(out[2]); r_his = np.asarray(out[1])[:k]
print("r_his:", [f"{r:.3e}" for r in r_his], flush=True)
print("DONE", flush=True)
