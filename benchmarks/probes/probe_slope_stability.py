"""Slope-measurement stability check: the same operator apply chain
timed at several (k_lo, k_hi) pairs, twice each, in one process.
Round-5 follow-up: short-chain slopes (k<=160) and long-chain slopes
(k>=256) disagreed 2x on the per-apply cost of small kernels, which
feeds the small-scale floor's per-block constant."""
import sys, time, json
sys.path.insert(0, ".")
import numpy as np
import scipy.sparse as sp


def main():
    import jax, jax.numpy as jnp
    from surface_multigrid_code_tpu.ops.well import (
        B_ROWS, build_well_dia, well_spmv)

    print("device:", jax.devices()[0], flush=True)

    def band(n, half):
        offs = list(range(-half, half + 1))
        return sp.diags([np.ones(n - abs(o)) for o in offs], offs,
                        format="csr")

    n = 161 * B_ROWS
    W = build_well_dia(band(n, 3), dtype=jnp.float32, q=(1, 1))
    W = W[0] if isinstance(W, tuple) else W
    chain_iters = W.nb * sum(W.ht)
    print(f"nb={W.nb} w={W.w} chain_iters/apply={chain_iters}", flush=True)
    x = jnp.ones((n,), jnp.float32)

    fs = {}

    def f_for(k):
        if k not in fs:
            @jax.jit
            def f(Wa, v0, k=k):
                def body(i, v):
                    y = well_spmv(Wa, v)
                    return y / jnp.sqrt(jnp.mean(y * y) + 1e-30)
                return jnp.sum(jax.lax.fori_loop(0, k, body, v0))
            float(f(W, x))
            fs[k] = f
        return fs[k]

    for k in (32, 64, 160, 256, 512, 1024):
        f_for(k)  # compile everything first

    out = []
    for rep in range(3):
        for k_lo, k_hi in ((32, 160), (64, 512), (256, 1024)):
            ts = {}
            for k in (k_lo, k_hi):
                f = f_for(k)
                best = 1e9
                for _ in range(5):
                    t0 = time.perf_counter()
                    float(f(W, x))
                    best = min(best, time.perf_counter() - t0)
                ts[k] = best
            sl = (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo) * 1e3
            row = {"rep": rep, "k": [k_lo, k_hi],
                   "t_lo_ms": round(ts[k_lo] * 1e3, 2),
                   "t_hi_ms": round(ts[k_hi] * 1e3, 2),
                   "slope_ms": round(sl, 5),
                   "ns_per_block": round(sl * 1e6 / W.nb, 1)}
            out.append(row)
            print(json.dumps(row), flush=True)
    print("RESULT", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
