"""HBM-regime (operator >> VMEM) V-cycle with the windowed Pallas kernel:
icosphere(9), 2.62M vertices / 5.24M faces. Honest slope timing."""
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
t0 = time.time()
V, F = icosphere(9)
mg = mg_precompute(V, F, verbose=False)
t_hier = time.time() - t0
print(f"hierarchy {t_hier:.0f}s levels={[l.V.shape[0] for l in mg]}", flush=True)
A = (massmatrix(V, F) - 0.01 * cotmatrix(V, F)).tocsr()
rhs = np.asarray(massmatrix(V, F) @ V[:, 0])
cfg = SolveConfig(smoother=SmootherType.JACOBI)
t0 = time.time()
data = min_quad_with_fixed_mg_precompute(A, None, mg, cfg=cfg, dtype=jnp.float32, well=True)
t_pre = time.time() - t0
print(f"precompute(well) {t_pre:.0f}s Hs={[tuple(w.H for w in l.Aw) for l in data.hier.levels]} "
      f"ws={[tuple(w.w for w in l.Aw) for l in data.hier.levels]}", flush=True)

rhs_p = rhs[data.perm]
rhs_d = jax.device_put(jnp.asarray(rhs_p, dtype=jnp.float32))
z0 = jnp.zeros_like(rhs_d)
tol_d = jnp.asarray(0.0, dtype=jnp.float32)
times = {}
for n_cyc in (8, 24):
    f = jax.jit(lambda h, b, z, t, n=n_cyc: jnp.sum(solve_loop(h, b, z, t, n, cfg)[0]))
    t0 = time.time(); s = float(f(data.hier, rhs_d, z0, tol_d)); tc = time.time() - t0
    best = float("inf")
    for _ in range(4):
        t0 = time.time(); s = float(f(data.hier, rhs_d, z0, tol_d)); best = min(best, time.time() - t0)
    times[n_cyc] = best
    print(f"n_cyc={n_cyc}: compile+1st {tc:.1f}s best {best*1e3:.2f} ms chk {s:.6e}", flush=True)
per = (times[24] - times[8]) / 16.0
print(f"WELL HBM V-cycle per-cycle (slope): {per*1e3:.3f} ms (was 2024 ms ELL)", flush=True)
nnz_cycle = 198.2e6
print(f"=> {nnz_cycle/per/1e9:.2f} Gnnz/s vs roofline 68.25, 0.8-target 54.6", flush=True)
out = solve_loop(data.hier, rhs_d, z0, jnp.asarray(1e-6, jnp.float32), 10, cfg)
k = int(out[2]); print("r_his:", [f"{r:.3e}" for r in np.asarray(out[1])[:k]], flush=True)
print("DONE", flush=True)
