"""Windowed-ELL Pallas kernel on real TPU: correctness + honest A/B timing
vs the XLA gather ell_spmv at flagship (icosphere-7 lv0) scale."""
import time
import numpy as np
from scipy.sparse.csgraph import reverse_cuthill_mckee

import jax, jax.numpy as jnp

from surface_multigrid_code_tpu.ops.laplacian import cotmatrix, massmatrix
from surface_multigrid_code_tpu.ops.sparse import ell_from_csr, ell_spmv
from surface_multigrid_code_tpu.ops.well import build_well, well_spmv
from surface_multigrid_code_tpu.utils.synthetic import icosphere

dev = jax.devices()[0]
print(f"device: {dev}", flush=True)

V, F = icosphere(7)
A = (massmatrix(V, F) - 0.01 * cotmatrix(V, F)).tocsr()
p = reverse_cuthill_mckee(A, symmetric_mode=True)
Ap = A[p][:, p].tocsr()
n = Ap.shape[0]

W = build_well(Ap, dtype=jnp.float32)
E = ell_from_csr(Ap, dtype=jnp.float32)
print(f"n={n} w={W.w} H={W.H} nb={W.nb} XR={W.XR}", flush=True)

rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))

# correctness on-device
y_ref = Ap @ np.asarray(x0)
t0 = time.time()
y = np.asarray(well_spmv(W, x0))
print(f"first well_spmv (compile): {time.time()-t0:.1f}s", flush=True)
err = np.abs(y - y_ref).max() / np.abs(y_ref).max()
print(f"TPU correctness relerr={err:.2e}", flush=True)
assert err < 1e-4


def bench(name, step, nnz):
    ts = {}
    for K in (8, 80):
        f = jax.jit(lambda x, K=K: jnp.sum(jax.lax.fori_loop(
            0, K,
            lambda i, v: (lambda y: y / jnp.sqrt(jnp.mean(y * y) + 1e-30))(step(v)),
            x)))
        s = float(f(x0))
        best = float("inf")
        for _ in range(4):
            t0 = time.time(); s = float(f(x0)); best = min(best, time.time() - t0)
        ts[K] = best
    per = (ts[80] - ts[8]) / 72.0
    print(f"{name:22s} per-spmv {per*1e3:8.3f} ms  "
          f"{nnz/per/1e9:8.2f} Gnnz/s  (chk {s:.4e})", flush=True)
    return per


nnz = Ap.nnz
t_well = bench("well_spmv (pallas)", lambda v: well_spmv(W, v), nnz)
t_ell = bench("ell_spmv (xla gather)", lambda v: ell_spmv(E, v), nnz)
print(f"speedup: {t_ell/t_well:.1f}x", flush=True)
print("DONE", flush=True)
