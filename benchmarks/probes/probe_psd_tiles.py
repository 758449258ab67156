"""Find WHICH packed tiles the Mosaic NS kernel gets wrong at real scale.

probe_psd_kernel: g=2260 grid=565 -> min eig rel -0.44 (partial/no
projection); probe_psd_stages: g=8 grid=2 -> bitwise match.  Hypotheses:
grid-size-dependent miscompile, pipelining/aliasing across grid steps, or
an input-content (block-diagonal) trigger.  This probe runs the REAL
packed operand through ns_sign_apply_packed and the XLA oracle and maps
the per-tile max error against grid position.
"""
import sys
sys.path.insert(0, ".")
import numpy as np


def main(m="31608"):
    import jax
    import jax.numpy as jnp
    from surface_multigrid_code_tpu.ops.psd import (
        NS_SCHEDULE, ns_sign_apply_packed, ns_sign_apply_packed_xla, _T)

    m = int(m)
    print("device:", jax.devices()[0], "m:", m, flush=True)
    rng = np.random.default_rng(0)
    B = rng.standard_normal((m, 9, 9)).astype(np.float32)
    H = 0.5 * (B + B.transpose(0, 2, 1))
    s = np.maximum(np.abs(H).sum(-1).max(-1), 1e-30)
    X = H / s[:, None, None]
    pack, d = 14, 9
    g = -(-m // pack)
    Xp = np.zeros((g * pack, d, d), np.float32)
    Xp[:m] = X
    Z = np.zeros((g, 128, 128), np.float32)
    for j in range(pack):
        Z[:, j * d:(j + 1) * d, j * d:(j + 1) * d] = Xp[j::pack][:g] if False else Xp.reshape(g, pack, d, d)[:, j]
    Zj = jnp.asarray(Z)

    got = np.asarray(ns_sign_apply_packed(Zj))
    want = np.asarray(jax.jit(ns_sign_apply_packed_xla, static_argnums=1)(
        Zj, NS_SCHEDULE))
    err = np.abs(got - want).max(axis=(1, 2))  # per tile
    scale = np.abs(want).max()
    bad = err > 1e-3 * scale
    print(f"tiles: {g}  bad: {bad.sum()}  err max={err.max():.3e} "
          f"scale={scale:.3e}", flush=True)
    idx = np.where(bad)[0]
    print("first 40 bad tiles:", idx[:40], flush=True)
    print("bad mod _T:", np.bincount(idx % _T, minlength=_T), flush=True)
    # distribution over grid steps
    steps = idx // _T
    u = np.unique(steps)
    print(f"bad grid steps: {len(u)} of {-(-g // _T)}; "
          f"first/last: {u[:8]} ... {u[-8:] if len(u) else []}", flush=True)
    # is got ~= input (sign=0) on bad tiles?
    if len(idx):
        t = idx[0]
        d0 = np.abs(got[t] - Z[t]).max()
        print(f"tile {t}: |got - x0|max={d0:.3e}  |got|max={np.abs(got[t]).max():.3e} "
              f"|want|max={np.abs(want[t]).max():.3e}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
