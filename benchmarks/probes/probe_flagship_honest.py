"""Honest (readback-forced, slope-method) timing of the flagship bench
program + per-level SpMV microbenchmarks. One TPU process, serial."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

dev = jax.devices()[0]
print(f"device: {dev}", flush=True)

# --- scalar roundtrip cost ---
a0 = jnp.ones((8, 128), jnp.float32)
triv = jax.jit(lambda a, i: a[0, 0] + i)
float(triv(a0, 0.0))
rts = []
for i in range(10):
    t0 = time.time(); float(triv(a0, float(i))); rts.append(time.time() - t0)
rt = float(np.median(rts))
print(f"scalar roundtrip: {rt*1e3:.2f} ms (median of 10, min {min(rts)*1e3:.2f})", flush=True)

from surface_multigrid_code_tpu.config import SolveConfig, SmootherType
from surface_multigrid_code_tpu.ops.laplacian import cotmatrix, massmatrix
from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute
from surface_multigrid_code_tpu.solver.mqwf_mg import min_quad_with_fixed_mg_precompute
from surface_multigrid_code_tpu.solver.vcycle import solve_loop
from surface_multigrid_code_tpu.ops.sparse import ell_spmv
from surface_multigrid_code_tpu.utils.synthetic import icosphere

V, F = icosphere(7)
t0 = time.time(); mg = mg_precompute(V, F, verbose=False); t_hier = time.time() - t0
L = cotmatrix(V, F); M = massmatrix(V, F)
A = (M - 0.01 * L).tocsr()
rhs = np.asarray(M @ V[:, 0])
cfg = SolveConfig(smoother=SmootherType.JACOBI)
t0 = time.time()
data = min_quad_with_fixed_mg_precompute(A, None, mg, cfg=cfg, dtype=jnp.float32)
t_pre = time.time() - t0
print(f"depth7 levels={[l.A.shape[0] for l in data.hier.levels]} "
      f"widths={[l.A.width for l in data.hier.levels]} hier={t_hier:.1f}s pre={t_pre:.1f}s",
      flush=True)

rhs_d = jax.device_put(jnp.asarray(rhs, dtype=jnp.float32))
z0 = jnp.zeros_like(rhs_d)
tol_d = jnp.asarray(0.0, dtype=jnp.float32)

# --- honest V-cycle timing: scalar readback at two cycle counts ---
times = {}
for n_cyc in (8, 40):
    f = jax.jit(lambda h, b, z, t, n=n_cyc: jnp.sum(solve_loop(h, b, z, t, n, cfg)[0]))
    t0 = time.time(); s = float(f(data.hier, rhs_d, z0, tol_d)); tc = time.time() - t0
    best = float("inf")
    for _ in range(5):
        t0 = time.time(); s = float(f(data.hier, rhs_d, z0, tol_d)); best = min(best, time.time() - t0)
    times[n_cyc] = best
    print(f"n_cyc={n_cyc}: compile+1st {tc:.1f}s best {best*1e3:.2f} ms checksum {s:.6e}", flush=True)
per_cycle = (times[40] - times[8]) / 32.0
print(f"HONEST per-cycle (slope): {per_cycle*1e3:.3f} ms", flush=True)

# --- the old (block_until_ready) methodology, same program ---
g = jax.jit(lambda h, b, z, t: solve_loop(h, b, z, t, 8, cfg)[0])
out = g(data.hier, rhs_d, z0, tol_d); jax.block_until_ready(out)
best = float("inf")
for _ in range(5):
    t0 = time.time()
    for _ in range(8):
        out = g(data.hier, rhs_d, z0, tol_d)
    jax.block_until_ready(out)
    best = min(best, (time.time() - t0) / 64.0)
print(f"OLD-METHOD per-cycle (b_u_r): {best*1e3:.4f} ms  "
      f"(ratio honest/old: {per_cycle/best:.1f}x)", flush=True)

# --- per-level SpMV chains (slope between two chain lengths) ---
print("--- per-level A SpMV (normalized chain, slope of K=16 vs 80) ---", flush=True)
for lv, level in enumerate(data.hier.levels):
    Ae = level.A
    n, w = Ae.indices.shape
    nnz = int(np.sum(np.asarray(Ae.data) != 0))
    x = jnp.ones((n,), jnp.float32)
    ts = {}
    for K in (16, 80):
        f = jax.jit(lambda Ae_, x_, K=K: jnp.sum(jax.lax.fori_loop(
            0, K, lambda i, v: (lambda y: y / jnp.sqrt(jnp.mean(y * y) + 1e-30))(ell_spmv(Ae_, v)), x_)))
        s = float(f(Ae, x))
        best = float("inf")
        for _ in range(4):
            t0 = time.time(); s = float(f(Ae, x)); best = min(best, time.time() - t0)
        ts[K] = best
    per = (ts[80] - ts[16]) / 64.0
    gbs = nnz * 12.0 / max(per, 1e-9) / 1e9
    print(f"lv{lv}: n={n} w={w} nnz={nnz} per-spmv {per*1e3:.3f} ms -> {gbs:.1f} GB/s", flush=True)

# --- P / PT chain at each coarse level: y = PT(P(y)) per iter ---
print("--- P+PT pair per level (slope K=16 vs 80) ---", flush=True)
for lv, level in enumerate(data.hier.levels):
    if level.P is None:
        continue
    P, PT = level.P, level.PT
    nc = P.n_cols
    pnnz = int(np.sum(np.asarray(P.data) != 0)) + int(np.sum(np.asarray(PT.data) != 0))
    x = jnp.ones((nc,), jnp.float32)
    ts = {}
    for K in (16, 80):
        f = jax.jit(lambda P_, PT_, x_, K=K: jnp.sum(jax.lax.fori_loop(
            0, K, lambda i, v: (lambda y: y / jnp.sqrt(jnp.mean(y * y) + 1e-30))(ell_spmv(PT_, ell_spmv(P_, v))), x_)))
        s = float(f(P, PT, x))
        best = float("inf")
        for _ in range(4):
            t0 = time.time(); s = float(f(P, PT, x)); best = min(best, time.time() - t0)
        ts[K] = best
    per = (ts[80] - ts[16]) / 64.0
    gbs = pnnz * 12.0 / max(per, 1e-9) / 1e9
    print(f"lv{lv}: P {P.shape} wP={P.width} wPT={PT.width} pairnnz={pnnz} per-pair {per*1e3:.3f} ms -> {gbs:.1f} GB/s", flush=True)

print("DONE", flush=True)
