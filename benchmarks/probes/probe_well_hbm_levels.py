"""Per-level well-kernel timings at icosphere-9 scale (where does the
232 ms/cycle go?)."""
import time
import numpy as np
import jax, jax.numpy as jnp

from surface_multigrid_code_tpu.config import SolveConfig, SmootherType
from surface_multigrid_code_tpu.ops.laplacian import cotmatrix, massmatrix
from surface_multigrid_code_tpu.ops.well import well_spmv
from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute
from surface_multigrid_code_tpu.solver.mqwf_mg import min_quad_with_fixed_mg_precompute
from surface_multigrid_code_tpu.utils.synthetic import icosphere

print(f"device: {jax.devices()[0]}", flush=True)
t0 = time.time()
V, F = icosphere(9)
mg = mg_precompute(V, F, verbose=False)
A = (massmatrix(V, F) - 0.01 * cotmatrix(V, F)).tocsr()
cfg = SolveConfig(smoother=SmootherType.JACOBI)
data = min_quad_with_fixed_mg_precompute(A, None, mg, cfg=cfg, dtype=jnp.float32, well=True)
print(f"setup {time.time()-t0:.0f}s", flush=True)

rng = np.random.default_rng(0)

def bench(tag, W):
    x0 = jnp.asarray(rng.standard_normal(W.n_cols).astype(np.float32))
    ts = {}
    for K in (8, 40):
        f = jax.jit(lambda x, K=K: jnp.sum(jax.lax.fori_loop(
            0, K, lambda i, v: (lambda y: y / jnp.sqrt(jnp.mean(y*y)+1e-30))(
                well_spmv(W, v)[:W.n_cols] if W.n_rows == W.n_cols else
                jax.lax.dynamic_slice(jnp.pad(well_spmv(W, v), (0, max(0, W.n_cols - W.n_rows))), (0,), (W.n_cols,))
            ), x0)))
        s = float(f(x0))
        best = float("inf")
        for _ in range(4):
            t0 = time.time(); s = float(f(x0)); best = min(best, time.time() - t0)
        ts[K] = best
    per = (ts[40] - ts[8]) / 32.0
    tiles = W.nb * W.w * W.H * 2
    print(f"{tag:10s} n={W.n_rows:8d} w={W.w:3d} H={W.H:4d} nb={W.nb:5d} "
          f"per-op {per*1e3:8.3f} ms  ({per*1e9/max(tiles,1):6.2f} ns/tile-op)", flush=True)

for lv, l in enumerate(data.hier.levels):
    bench(f"A lv{lv}", l.Aw)
    if l.Pw is not None:
        bench(f"P lv{lv}", l.Pw)
        bench(f"PT lv{lv}", l.PTw)
print("DONE", flush=True)
