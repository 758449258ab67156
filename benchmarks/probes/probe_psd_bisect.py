"""Bisect psd_project_blocks stage-by-stage on TPU vs numpy replication.

probe_psd_tiles proved the kernel bitwise-matches its oracle at full
scale, yet psd_project_blocks output is unprojected (min eig rel -0.44).
Replicate each stage in numpy from the same input and find the first
divergence: scale s, packed Z, kernel Y, extraction Yb, Hp, clamp mask.
"""
import sys
sys.path.insert(0, ".")
import numpy as np


def main(m="31608"):
    import jax
    import jax.numpy as jnp
    from surface_multigrid_code_tpu.models.shell import psd_project_blocks
    from surface_multigrid_code_tpu.ops.psd import (
        NS_SCHEDULE, ns_sign_apply_packed)

    m = int(m)
    print("device:", jax.devices()[0], "m:", m, flush=True)
    rng = np.random.default_rng(0)
    B = rng.standard_normal((m, 9, 9)).astype(np.float32)
    Hn = 0.5 * (B + B.transpose(0, 2, 1))
    H = jnp.asarray(Hn)

    # --- numpy replication ---
    s = np.maximum(np.abs(Hn).sum(-1).max(-1), 1e-30)
    X = Hn / s[:, None, None]
    pack, d = 14, 9
    g = -(-m // pack)
    Xp = np.zeros((g * pack, d, d), np.float32)
    Xp[:m] = X
    X4 = Xp.reshape(g, pack, d, d)
    Z = np.zeros((g, 128, 128), np.float32)
    for j in range(pack):
        Z[:, j * d:(j + 1) * d, j * d:(j + 1) * d] = X4[:, j]

    # jax stages replicated from shell.py
    Hs_j = 0.5 * (H + jnp.swapaxes(H, -1, -2))
    s_j = jnp.maximum(jnp.abs(Hs_j).sum(axis=-1).max(axis=-1), 1e-30)
    X_j = Hs_j / s_j[:, None, None]
    Xpad = jnp.zeros((g * pack, d, d), dtype=H.dtype)
    Xpad = jax.lax.dynamic_update_slice(Xpad, X_j, (0, 0, 0))
    X4_j = Xpad.reshape(g, pack, d, d)
    Z_j = jnp.zeros((g, 128, 128), dtype=H.dtype)
    for j in range(pack):
        Z_j = jax.lax.dynamic_update_slice(Z_j, X4_j[:, j], (0, j * d, j * d))

    print("s diff:", np.abs(np.asarray(s_j) - s).max(), flush=True)
    print("Z diff:", np.abs(np.asarray(Z_j) - Z).max(), flush=True)

    Y_j = ns_sign_apply_packed(Z_j)
    Yn = np.asarray(ns_sign_apply_packed(jnp.asarray(Z)))
    print("Y(jax-Z) vs Y(np-Z) diff:", np.abs(np.asarray(Y_j) - Yn).max(),
          flush=True)

    # numpy extraction + assembly from Yn
    Yb = np.stack([Yn[:, j * d:(j + 1) * d, j * d:(j + 1) * d]
                   for j in range(pack)], axis=1).reshape(g * pack, d, d)[:m]
    Hp = 0.5 * s[:, None, None] * Yb
    Hp = 0.5 * (Hp + Hp.transpose(0, 2, 1))
    clamped = np.abs(Hp - Hn).max(axis=(-1, -2)) > 1e-4 * s
    out_np = np.where(clamped[:, None, None], Hp, Hn)
    w = np.linalg.eigvalsh(out_np.astype(np.float64))
    print(f"numpy-assembled: clamped={clamped.sum()}/{m} min_eig_rel="
          f"{w.min() / np.abs(w).max():.3e}", flush=True)

    out_j = np.asarray(psd_project_blocks(H))
    print("full fn vs numpy-assembled diff:",
          np.abs(out_j - out_np).max(), flush=True)
    wj = np.linalg.eigvalsh(out_j.astype(np.float64))
    print(f"full fn: min_eig_rel={wj.min() / np.abs(wj).max():.3e}",
          flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
