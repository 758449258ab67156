"""A/B the NS sign kernel's matmul precision: HIGHEST (6-pass f32, the
round-4 fix) vs HIGH (3-pass bf16x3) vs DEFAULT (1-pass bf16).

Round 4 proved DEFAULT breaks the accelerated schedule (min-eig-rel
-0.44).  HIGH halves the MXU passes; this measures whether its ~1e-6-rel
product error stays below the schedule's ~700x noise amplification
budget (acceptance: min_eig_rel within ~10x of HIGHEST's -5e-5 AND rel
diff vs the f64 eigendecomposition projection comparable), plus the
kernel slope time for each.
"""
import sys, time
from functools import partial
sys.path.insert(0, ".")
import numpy as np


def slope(f, x, k_lo=2, k_hi=8, reps=3):
    ts = {}
    for k in (k_lo, k_hi):
        float(f(x, k))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(x, k))
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    return (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo) * 1e3


def main(m="31608"):
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from surface_multigrid_code_tpu.ops.psd import NS_SCHEDULE, _TILE, _T

    m = int(m)
    print("device:", jax.devices()[0], "m:", m, flush=True)
    rng = np.random.default_rng(0)
    B = rng.standard_normal((m, 9, 9)).astype(np.float32)
    Hn = 0.5 * (B + B.transpose(0, 2, 1))

    # pack (replicating shell.psd_project_blocks stages in numpy)
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
    Zj = jnp.asarray(Z)

    # f64 eigendecomposition reference projection (host)
    w, Q = np.linalg.eigh(Hn.astype(np.float64))
    Hp64 = np.einsum("fik,fk,fjk->fij", Q, np.maximum(w, 0.0), Q)

    def make_kernel(prec, sched=NS_SCHEDULE):
        def dot(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32,
                           precision=prec)

        def kern(x_ref, y_ref):
            x0 = [x_ref[t] for t in range(_T)]
            z = list(x0)
            for a, b in sched:
                z2 = [dot(zt, zt) for zt in z]
                z = [a * zt - b * dot(z2t, zt) for zt, z2t in zip(z, z2)]
            for t in range(_T):
                y_ref[t] = x0[t] + dot(x0[t], z[t])

        gp = -(-g // _T) * _T

        @jax.jit
        def apply(Zin):
            Zp = Zin
            if gp != g:
                Zp = jnp.concatenate(
                    [Zp, jnp.zeros((gp - g, 128, 128), jnp.float32)], 0)
            y = pl.pallas_call(
                kern, grid=(gp // _T,),
                in_specs=[pl.BlockSpec((_T, _TILE, _TILE),
                                       lambda i: (i, 0, 0))],
                out_specs=pl.BlockSpec((_T, _TILE, _TILE),
                                       lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((gp, _TILE, _TILE),
                                               jnp.float32),
            )(Zp)
            return y[:g]

        return apply

    # NOTE: Mosaic rejects Precision.HIGH in-kernel (NotImplementedError
    # "Unsupported dot precision: HIGH") -- only DEFAULT and HIGHEST
    # lower, so the 3-pass middle ground is not expressible here.
    for name, prec, sched in (
            ("HIGHEST", jax.lax.Precision.HIGHEST, NS_SCHEDULE),
            ("HIGHEST-trunc1", jax.lax.Precision.HIGHEST, NS_SCHEDULE[:-1]),
            ("HIGHEST-trunc2", jax.lax.Precision.HIGHEST, NS_SCHEDULE[:-2]),
            ("HIGHEST-trunc3", jax.lax.Precision.HIGHEST, NS_SCHEDULE[:-3]),
            ("DEFAULT", jax.lax.Precision.DEFAULT, NS_SCHEDULE)):
        apply = make_kernel(prec, sched)
        Yn = np.asarray(apply(Zj))
        Yb = np.stack([Yn[:, j * d:(j + 1) * d, j * d:(j + 1) * d]
                       for j in range(pack)], 1).reshape(g * pack, d, d)[:m]
        Hp = 0.5 * s[:, None, None] * Yb
        Hp = 0.5 * (Hp + Hp.transpose(0, 2, 1))
        clamped = np.abs(Hp - Hn).max(axis=(-1, -2)) > 1e-4 * s
        out = np.where(clamped[:, None, None], Hp, Hn)
        ww = np.linalg.eigvalsh(out.astype(np.float64))
        mer = ww.min() / np.abs(ww).max()
        rd = (np.abs(out - Hp64).max()
              / np.abs(Hp64).max())
        # slope-time the kernel
        @jax.jit
        def chain(Z0, k, apply=apply):
            def body(i, c):
                y = apply(Z0 * (1.0 + c * 1e-30))
                return jnp.sum(y) * 1e-30
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        t = slope(chain, Zj)
        print(f"{name}: min_eig_rel={mer:.3e} reldiff_vs_f64={rd:.3e} "
              f"clamped={int(clamped.sum())}/{m} kernel_slope={t:.2f} ms",
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
