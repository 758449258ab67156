"""Break down the new PSD projection cost: kernel alone vs packing vs
full psd_project_blocks, readback-forced chained slopes (CLAUDE.md).
"""
import sys, time
sys.path.insert(0, ".")
import numpy as np


def slope(f, *args, k_lo=2, k_hi=8, reps=3):
    ts = {}
    for k in (k_lo, k_hi):
        float(f(*args, k))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args, k))
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    return (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo) * 1e3


def main(m="31608"):
    import jax, jax.numpy as jnp
    from functools import partial
    from surface_multigrid_code_tpu.models.shell import psd_project_blocks
    from surface_multigrid_code_tpu.ops.psd import (
        NS_SCHEDULE, ns_sign_apply_packed)

    m = int(m)
    print("device:", jax.devices()[0], "m:", m, flush=True)
    rng = np.random.default_rng(0)
    B = rng.standard_normal((m, 9, 9)).astype(np.float32)
    H = jnp.asarray(0.5 * (B + B.transpose(0, 2, 1)))
    pack, d = 14, 9
    g = -(-m // pack)
    Zn = np.zeros((g, 128, 128), np.float32)
    s = np.maximum(np.abs(np.asarray(H)).sum(-1).max(-1), 1e-30)
    X = (np.asarray(H) / s[:, None, None])
    Xp = np.zeros((g * pack, d, d), np.float32)
    Xp[:m] = X
    X4 = Xp.reshape(g, pack, d, d)
    for j in range(pack):
        Zn[:, j * d:(j + 1) * d, j * d:(j + 1) * d] = X4[:, j]
    Z = jnp.asarray(Zn)

    def pack_only(Hin):
        Hs = 0.5 * (Hin + jnp.swapaxes(Hin, -1, -2))
        sj = jnp.maximum(jnp.abs(Hs).sum(-1).max(-1), 1e-30)
        Xj = Hs / sj[:, None, None]
        Xpad = jnp.zeros((g * pack, d, d), Hin.dtype)
        Xpad = jax.lax.dynamic_update_slice(Xpad, Xj, (0, 0, 0))
        X4j = Xpad.reshape(g, pack, d, d)
        Zj = jnp.zeros((g, 128, 128), Hin.dtype)
        for j in range(pack):
            Zj = jax.lax.dynamic_update_slice(Zj, X4j[:, j], (0, j * d, j * d))
        return Zj

    @jax.jit
    def chain_kernel(Z0, k):
        def body(i, z):
            y = ns_sign_apply_packed(z)
            return 0.25 * y  # keep magnitudes bounded across the chain
        return jnp.sum(jax.lax.fori_loop(0, k, body, Z0))

    @jax.jit
    def chain_pack(H0, k):
        def body(i, h):
            z = pack_only(h)
            # feed something H-shaped back out so the chain depends on z
            return h + 0.0 * z[:1, 0, 0]
        return jnp.sum(jax.lax.fori_loop(0, k, body, H0))

    @jax.jit
    def chain_full(H0, k):
        return jnp.sum(jax.lax.fori_loop(
            0, k, lambda i, h: psd_project_blocks(h), H0))

    r = {}
    r["kernel_only_ms"] = slope(chain_kernel, Z)
    print(r, flush=True)
    r["pack_only_ms"] = slope(chain_pack, H)
    print(r, flush=True)
    r["full_ms"] = slope(chain_full, H)
    print("RESULT", r, flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
