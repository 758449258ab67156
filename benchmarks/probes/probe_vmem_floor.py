"""Decompose the VMEM-regime (ico7) V-cycle gap to the cost-model floor
(VERDICT r4 weak 1 / next 2): the bench measures 0.829 ms/cycle vs a
0.497 ms select-chain floor (vs_floor 0.599).

Hypotheses measured here:
  (a) the solve_loop convergence check costs a 6th fine-level A-apply
      per cycle that the 5-apply floor model never counted;
  (b) ~30 Pallas kernel launches per cycle pay a per-launch overhead
      that dominates at VMEM scale (the HBM regime amortizes it);
  (c) a shallower device hierarchy (dense-direct at ~2.5K rows instead
      of recursing to 642) removes ~8 launches + 2 transfer levels —
      the static-solve mirror of the balloon's extend_hierarchy insight
      (there the coarse INVERSE is rebuilt per Newton; here it is built
      once, so bigger-and-shallower wins).

Outputs per-launch overhead (tiny-kernel slope), exact launch counts,
and measured cycle times for the full vs truncated hierarchy.
"""
import sys, time, json
sys.path.insert(0, ".")
import numpy as np


def slope_ms(fn, args, k_lo, k_hi, reps=5):
    ts = {}
    for k in (k_lo, k_hi):
        f = fn(k)
        float(f(*args))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args))
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    return (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo) * 1e3


def count_launches(hier, cfg):
    """Pallas calls per _vcycle_tiled V-cycle + 1 solve_loop resid."""
    def groups(W):
        return len(W) if isinstance(W, tuple) else 1

    n = 0
    L = len(hier.levels)
    for lv, lev in enumerate(hier.levels):
        if lv < L - 1:
            n += 5 * groups(lev.Aw)          # 2+2 smoother + residual
        if lev.PTw is not None:
            n += groups(lev.PTw)
        if lev.Pw is not None:
            n += groups(lev.Pw)
    return n + groups(hier.levels[0].Aw)     # solve_loop resid check


def main():
    import jax, jax.numpy as jnp
    from surface_multigrid_code_tpu.config import SolveConfig, SmootherType
    from surface_multigrid_code_tpu.ops.laplacian import cotmatrix, massmatrix
    from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute
    from surface_multigrid_code_tpu.solver.mqwf_mg import (
        min_quad_with_fixed_mg_precompute)
    from surface_multigrid_code_tpu.solver.vcycle import solve_loop
    from surface_multigrid_code_tpu.ops.well import build_well_auto, well_apply
    import scipy.sparse as sp
    from surface_multigrid_code_tpu.utils.synthetic import icosphere

    sys.path.insert(0, ".")
    from bench import _chain_iters_per_cycle, _FLOOR_NS_PER_CHAIN_ITER

    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    # --- (b) per-launch overhead: tiny 1-block identity-ish operator ---
    n_tiny = 1024
    A_tiny = sp.identity(n_tiny, format="csr")
    Wt = build_well_auto(A_tiny, dtype=jnp.float32)
    x_t = jnp.ones((n_tiny,), jnp.float32)

    def tiny_chain(k):
        @jax.jit
        def f(W, x):
            def body(i, v):
                y = well_apply(W, v)
                return y / jnp.sqrt(jnp.mean(y * y) + 1e-30)
            return jnp.sum(jax.lax.fori_loop(0, k, body, x))
        return f
    t_launch_ms = slope_ms(tiny_chain, (Wt, x_t), 64, 512)
    print(f"per-launch overhead (tiny kernel + norm): "
          f"{t_launch_ms*1e3:.2f} us", flush=True)

    # --- bench-identical ico7 path ---
    V, F = icosphere(7)
    mg = mg_precompute(V, F, verbose=False)
    Lc = cotmatrix(V, F)
    M = massmatrix(V, F)
    A = (M - 0.01 * Lc).tocsr()
    rhs = np.asarray(M @ V[:, 0])
    cfg = SolveConfig(smoother=SmootherType.JACOBI)

    results = {}
    for name, mg_use in (("full", mg), ("trunc2562", mg[:4])):
        t0 = time.time()
        data = min_quad_with_fixed_mg_precompute(
            A, None, mg_use, cfg=cfg, dtype=jnp.float32)
        t_pre = time.time() - t0
        r = rhs[data.perm] if data.perm is not None else rhs
        rhs_d = jax.device_put(jnp.asarray(r, dtype=jnp.float32))
        z0 = jnp.zeros_like(rhs_d)
        tol_d = jnp.asarray(0.0, jnp.float32)

        def loop(k, data=data):
            @jax.jit
            def f(h, b, z, t):
                return jnp.sum(solve_loop(h, b, z, t, k, cfg)[0])
            return f
        per_cycle = slope_ms(loop, (data.hier, rhs_d, z0, tol_d), 8, 40)
        # convergence quality (residual factor over 8 cycles)
        out = solve_loop(data.hier, rhs_d, z0, tol_d, 8, cfg)
        r_his = [float(x) for x in np.asarray(out[1])[: int(out[2])]]
        rate = (r_his[-1] / r_his[0]) ** (1.0 / max(1, len(r_his) - 1))
        chain = _chain_iters_per_cycle(data.hier)
        # +1 fine-level A-apply: the solve_loop residual check
        def per_apply(W):
            tot = 0
            for g in W if isinstance(W, tuple) else (W,):
                tot += g.nb * (sum(g.ht) if g.ht is not None else g.w * g.H)
            return tot
        chain6 = chain + per_apply(data.hier.levels[0].Aw)
        nl = count_launches(data.hier, cfg)
        floor5 = chain * _FLOOR_NS_PER_CHAIN_ITER / 1e6
        floor6 = chain6 * _FLOOR_NS_PER_CHAIN_ITER / 1e6
        floor_launch = floor6 + nl * t_launch_ms
        results[name] = {
            "levels": [lv.diag.shape[0] for lv in data.hier.levels],
            "t_cycle_ms": round(per_cycle, 4),
            "t_precompute_s": round(t_pre, 1),
            "resid_rate": round(rate, 4),
            "launches_per_cycle": nl,
            "floor5_ms": round(floor5, 4),
            "floor6_ms": round(floor6, 4),
            "floor_launch_ms": round(floor_launch, 4),
            "vs_floor5": round(floor5 / per_cycle, 4),
            "vs_floor_launch": round(floor_launch / per_cycle, 4),
        }
        print(name, json.dumps(results[name]), flush=True)
    print("RESULT", json.dumps(
        {"t_launch_us": round(t_launch_ms * 1e3, 2), **results}), flush=True)


if __name__ == "__main__":
    main()
