"""A/B the PSD projection: legacy 16x-NS einsum vs new schedule vs fused
Pallas kernel, at balloon scale (bunny_15K: 31,608 faces, 9x9 blocks).

Readback-forced slope methodology (CLAUDE.md): jit K chained projections
behind a traced fori_loop, time float(sum) at two K values, report slope.
"""
import sys, time
sys.path.insert(0, ".")
import numpy as np


def slope(f, x, k_lo=2, k_hi=8, reps=3):
    ts = {}
    for k in (k_lo, k_hi):
        float(f(x, k))  # compile+warm
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(x, k))
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    return (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo) * 1e3


def main(m="31608"):
    import jax, jax.numpy as jnp
    from surface_multigrid_code_tpu.models.shell import psd_project_blocks

    m = int(m)
    print("device:", jax.devices()[0], "m:", m, flush=True)
    rng = np.random.default_rng(0)
    B = rng.standard_normal((m, 9, 9)).astype(np.float32)
    H = jnp.asarray(0.5 * (B + B.transpose(0, 2, 1)))

    def legacy_project(Hin):
        # round-3 shipped path: inf-norm scale, 16x plain NS einsum fori,
        # packed 126x126 (kept verbatim for the A/B)
        Hs = 0.5 * (Hin + jnp.swapaxes(Hin, -1, -2))
        s = jnp.maximum(jnp.abs(Hs).sum(-1).max(-1), 1e-30)
        X = Hs / s[:, None, None]
        pack, d = 14, 9
        g = -(-m // pack)
        Xp = jnp.zeros((g * pack, d, d), X.dtype)
        Xp = jax.lax.dynamic_update_slice(Xp, X, (0, 0, 0))
        X4 = Xp.reshape(g, pack, d, d)
        Z = jnp.zeros((g, pack * d, pack * d), X.dtype)
        for j in range(pack):
            Z = jax.lax.dynamic_update_slice(Z, X4[:, j], (0, j * d, j * d))

        def body(i, Z):
            Z2 = jnp.einsum("fij,fjk->fik", Z, Z)
            return 1.5 * Z - 0.5 * jnp.einsum("fij,fjk->fik", Z2, Z)

        S = jax.lax.fori_loop(0, 16, body, Z)
        Sb = jnp.stack(
            [jax.lax.dynamic_slice(S, (0, j * d, j * d), (g, d, d))
             for j in range(pack)], axis=1,
        ).reshape(g * pack, d, d)[:m]
        Hp = 0.5 * (Hs + jnp.einsum("fij,fjk->fik", Hs, Sb))
        Hp = 0.5 * (Hp + jnp.swapaxes(Hp, -1, -2))
        clamped = jnp.abs(Hp - Hs).max(axis=(-1, -2)) > 1e-4 * s
        return jnp.where(clamped[:, None, None], Hp, Hin)

    @jax.jit
    def chain_legacy(H0, k):
        return jnp.sum(jax.lax.fori_loop(
            0, k, lambda i, h: legacy_project(h), H0))

    @jax.jit
    def chain_new(H0, k):
        return jnp.sum(jax.lax.fori_loop(
            0, k, lambda i, h: psd_project_blocks(h), H0))

    r = {}
    r["legacy_16ns_einsum_ms"] = slope(chain_legacy, H)
    print("legacy:", r, flush=True)
    r["new_kernel_ms"] = slope(chain_new, H)
    print(r, flush=True)

    # parity: both project to ~the same PSD matrix
    a = np.asarray(legacy_project(H))
    b = np.asarray(psd_project_blocks(H))
    scale = np.abs(a).max()
    r["max_rel_diff_vs_legacy"] = float(np.abs(a - b).max() / scale)
    w = np.linalg.eigvalsh(b.astype(np.float64))
    r["new_min_eig_rel"] = float(w.min() / np.abs(w).max())
    print("RESULT", r, flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
