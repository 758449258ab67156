"""Honest (readback-forced slope) A/B of gather phrasings for the ELL SpMV.

Hypothesis from the round-1 BSR result: gathering ROWS of a 2-D array is
~46x faster per element than 1-D scalar gather on this TPU. Verify with
honest timing, then pick the fast SpMV phrasing.
"""
import time
import numpy as np
import jax, jax.numpy as jnp

dev = jax.devices()[0]
print(f"device: {dev}", flush=True)

rng = np.random.default_rng(0)
n = 163842
w = 7
idx_np = rng.integers(0, n, size=(n, w)).astype(np.int32)
dat_np = rng.standard_normal((n, w)).astype(np.float32)
idx = jnp.asarray(idx_np)
dat = jnp.asarray(dat_np)
x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))


def bench(name, step, nbytes_useful):
    """step: x [n] -> y [n]; chained K times with normalization."""
    ts = {}
    for K in (8, 40):
        f = jax.jit(lambda x, K=K: jnp.sum(jax.lax.fori_loop(
            0, K,
            lambda i, v: (lambda y: y / jnp.sqrt(jnp.mean(y * y) + 1e-30))(step(v)),
            x)))
        s = float(f(x0))
        best = float("inf")
        for _ in range(4):
            t0 = time.time(); s = float(f(x0)); best = min(best, time.time() - t0)
        ts[K] = best
    per = (ts[40] - ts[8]) / 32.0
    nspe = per / (n * w) * 1e9
    print(f"{name:28s} per-op {per*1e3:8.3f} ms  {nspe:7.3f} ns/elt  "
          f"{nbytes_useful/per/1e9:7.1f} GB/s  (chk {s:.4e})", flush=True)
    return per


useful = n * w * 12.0

# 1. current: 1-D scalar gather
bench("scalar1d x[idx]", lambda x: (dat * x[idx]).sum(axis=1), useful)

# 2. row-gather width 1: x as [n,1]
bench("row1 x[:,None][idx]", lambda x: (dat * x[:, None][idx][..., 0]).sum(axis=1), useful)

# 3. row-gather width 8
def row8(x):
    x2 = jnp.broadcast_to(x[:, None], (n, 8))
    return (dat * x2[idx][..., 0]).sum(axis=1)
bench("row8 bcast[idx][...,0]", row8, useful)

# 4. take(x, idx, axis=0)
bench("jnp.take axis0", lambda x: (dat * jnp.take(x, idx, axis=0)).sum(axis=1), useful)

# 5. flat then reshape
bench("flat ravel gather", lambda x: (dat * x[idx.ravel()].reshape(n, w)).sum(axis=1), useful)

# 6. row1 via explicit gather dims on 2D operand
def row1g(x):
    g = jax.lax.gather(
        x[:, None], idx.reshape(-1, 1),
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0,)),
        slice_sizes=(1, 1)).reshape(n, w)
    return (dat * g).sum(axis=1)
bench("lax.gather 2D rows", row1g, useful)

# 7. one-hot within 128-window two-level: hi = idx//128 rows of x2d [n/128,128]
n128 = n // 128 * 128
idx_c = jnp.minimum(idx, n128 - 1)
hi = idx_c // 128
lo = idx_c % 128
def twolevel(x):
    x2d = x[:n128].reshape(-1, 128)
    rows = x2d[hi]                      # row gather [n, w, 128]
    g = jnp.take_along_axis(rows, lo[..., None], axis=2)[..., 0]
    return (dat * g).sum(axis=1).at[0].add(jnp.sum(x[n128:]) * 0)
bench("2lvl rowgather+taa", twolevel, useful)

print("DONE", flush=True)
