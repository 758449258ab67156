"""Correctness check of the windowed-ELL Pallas kernel (interpret mode, CPU)."""
import numpy as np
import scipy.sparse as sp
from scipy.sparse.csgraph import reverse_cuthill_mckee

import jax.numpy as jnp

from surface_multigrid_code_tpu.ops.well import build_well, well_spmv

rng = np.random.default_rng(0)

# 1. random banded matrix
n = 3000
d = 40
rows = np.repeat(np.arange(n), 5)
cols = np.clip(rows + rng.integers(-d, d + 1, size=rows.size), 0, n - 1)
vals = rng.standard_normal(rows.size)
A = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
W = build_well(A, dtype=jnp.float32)
x = rng.standard_normal(n).astype(np.float32)
y_ref = A @ x
y = np.asarray(well_spmv(W, jnp.asarray(x), interpret=True))
err = np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-30)
print(f"banded: H={W.H} w={W.w} nb={W.nb} relerr={err:.2e}")
assert err < 1e-5

# 2. real mesh Laplacian with RCM, rectangular P too
from surface_multigrid_code_tpu.ops.laplacian import cotmatrix, massmatrix
from surface_multigrid_code_tpu.utils.synthetic import icosphere

V, F = icosphere(5)
L = (massmatrix(V, F) - 0.01 * cotmatrix(V, F)).tocsr()
p = reverse_cuthill_mckee(L, symmetric_mode=True)
Lp = L[p][:, p].tocsr()
W2 = build_well(Lp, dtype=jnp.float32)
x2 = rng.standard_normal(Lp.shape[0]).astype(np.float32)
y2 = np.asarray(well_spmv(W2, jnp.asarray(x2), interpret=True))
y2_ref = Lp @ x2
err2 = np.abs(y2 - y2_ref).max() / np.abs(y2_ref).max()
print(f"mesh lv0: n={Lp.shape[0]} H={W2.H} w={W2.w} nb={W2.nb} relerr={err2:.2e}")
assert err2 < 1e-4

# 3. rectangular (prolongation-like): random [n, m] with local columns
m = 800
rowsP = np.repeat(np.arange(n), 3)
colsP = np.clip((rowsP * m) // n + rng.integers(-10, 11, size=rowsP.size), 0, m - 1)
valsP = rng.random(rowsP.size)
P = sp.coo_matrix((valsP, (rowsP, colsP)), shape=(n, m)).tocsr()
WP = build_well(P, dtype=jnp.float32)
xp = rng.standard_normal(m).astype(np.float32)
yp = np.asarray(well_spmv(WP, jnp.asarray(xp), interpret=True))
err3 = np.abs(yp - P @ xp).max() / np.abs(P @ xp).max()
print(f"rect P: H={WP.H} w={WP.w} nb={WP.nb} relerr={err3:.2e}")
assert err3 < 1e-5

print("ALL OK")
