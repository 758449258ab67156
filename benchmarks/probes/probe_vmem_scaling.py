"""Per-level windowed-kernel apply times on the ico7 bench hierarchy:
measure each operator's standalone apply slope and compare to
chain_iters x 2.645 ns.  Fits the small-scale overhead: excess(level) vs
nb (per-grid-step cost) — the launch probe already bounded per-LAUNCH at
~0.9 us, so whatever the excess scales with is the real floor term.
"""
import sys, time, json
sys.path.insert(0, ".")
import numpy as np


def slope_ms(build, args, k_lo=16, k_hi=80, reps=4):
    ts = {}
    for k in (k_lo, k_hi):
        f = build(k)
        float(f(*args))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args))
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    return (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo) * 1e3


def main():
    import jax, jax.numpy as jnp
    from surface_multigrid_code_tpu.config import SolveConfig, SmootherType
    from surface_multigrid_code_tpu.ops.laplacian import cotmatrix, massmatrix
    from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute
    from surface_multigrid_code_tpu.solver.mqwf_mg import (
        min_quad_with_fixed_mg_precompute)
    from surface_multigrid_code_tpu.ops.well import well_apply, B_ROWS
    from surface_multigrid_code_tpu.utils.synthetic import icosphere

    print("device:", jax.devices()[0], flush=True)
    V, F = icosphere(7)
    mg = mg_precompute(V, F, verbose=False)
    Lc = cotmatrix(V, F)
    M = massmatrix(V, F)
    A = (M - 0.01 * Lc).tocsr()
    cfg = SolveConfig(smoother=SmootherType.JACOBI)
    data = min_quad_with_fixed_mg_precompute(
        A, None, mg, cfg=cfg, dtype=jnp.float32)

    def stats(W):
        gs = W if isinstance(W, tuple) else (W,)
        nb = sum(g.nb for g in gs)
        chain = sum(
            g.nb * (sum(g.ht) if g.ht is not None else g.w * g.H)
            for g in gs)
        return nb, chain, len(gs)

    rows = []
    for lv, lev in enumerate(data.hier.levels):
        for tag, W in (("A", lev.Aw), ("PT", lev.PTw), ("P", lev.Pw)):
            if W is None:
                continue
            nb, chain, ng = stats(W)
            W0 = W if not isinstance(W, tuple) else W[0]
            ncol = W0.n_cols if hasattr(W0, "n_cols") else None
            n_in = {"A": lev.diag.shape[0], "PT": None, "P": None}[tag]
            # input length: what the operator consumes
            xin = jnp.ones((W0.XR * 128,), jnp.float32)

            def build(k, W=W):
                @jax.jit
                def f(Wa, x):
                    def body(i, v):
                        y = well_apply(Wa, v, unpadded=False)
                        # renormalize on the OUTPUT size; reshape back to
                        # input size via modular slice if shapes differ
                        y = y / jnp.sqrt(jnp.mean(y * y) + 1e-30)
                        if y.shape[0] == x.shape[0]:
                            return y
                        reps = -(-x.shape[0] // y.shape[0])
                        return jnp.tile(y, reps)[: x.shape[0]]
                    return jnp.sum(jax.lax.fori_loop(0, k, body, x))
                return f

            t = slope_ms(build, (W, xin))
            floor = chain * 2.645e-6
            rows.append({
                "lv": lv, "op": tag, "nb": nb, "groups": ng,
                "chain_iters": chain, "t_ms": round(t, 5),
                "floor_ms": round(floor, 5),
                "excess_us": round((t - floor) * 1e3, 2),
                "excess_per_nb_ns": round((t - floor) * 1e6 / max(nb, 1), 1),
            })
            print(json.dumps(rows[-1]), flush=True)
    print("RESULT", json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
