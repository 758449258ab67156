"""Calibrate the windowed kernel's per-grid-step (block) overhead.

Synthetic banded operators (bandwidth +-3, w=7 taps) at varying row
counts nb*1024 — same per-block window shape, so per-block chain work is
constant and the apply-time slope vs nb IS the marginal per-block cost.
A second sweep at a wider window (H~64) checks whether the overhead is
additive (DMA/grid bubbles not overlapped at small work) or hidden
behind compute (the HBM-regime behavior where the 2.645 ns/iter chain
model alone matched measurement).
"""
import sys, time, json
sys.path.insert(0, ".")
import numpy as np
import scipy.sparse as sp


def slope_vs_k(build, args, k_lo=32, k_hi=160, reps=4):
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


def band_csr(n, half):
    offs = [o for o in range(-half, half + 1)]
    diags = [np.ones(n - abs(o)) for o in offs]
    return sp.diags(diags, offs, format="csr")


def main():
    import jax, jax.numpy as jnp
    from surface_multigrid_code_tpu.ops.well import (
        build_well_auto, well_apply)

    print("device:", jax.devices()[0], flush=True)
    out = {}
    for half, tag in ((3, "narrow"), (31, "wide")):
        pts = []
        for nb in (1, 4, 16, 64, 256):
            n = nb * 1024
            A = band_csr(n, half)
            W = build_well_auto(A, dtype=jnp.float32)
            gs = W if isinstance(W, tuple) else (W,)
            chain = sum(
                g.nb * (sum(g.ht) if g.ht is not None else g.w * g.H)
                for g in gs)
            nb_real = sum(g.nb for g in gs)
            x = jnp.ones((n,), jnp.float32)

            def build(k, W=W):
                @jax.jit
                def f(Wa, v0):
                    def body(i, v):
                        y = well_apply(Wa, v)
                        return y / jnp.sqrt(jnp.mean(y * y) + 1e-30)
                    return jnp.sum(jax.lax.fori_loop(0, k, body, v0))
                return f

            t = slope_vs_k(build, (W, x))
            floor = chain * 2.645e-6
            pts.append({"nb": nb_real, "chain": chain,
                        "iters_per_block": round(chain / nb_real, 1),
                        "t_ms": round(t, 5), "chain_floor_ms": round(floor, 5),
                        "excess_us": round((t - floor) * 1e3, 2)})
            print(tag, json.dumps(pts[-1]), flush=True)
        # marginal per-block cost: fit excess ~ a + b*nb over the last 3
        xs = np.array([p["nb"] for p in pts[-3:]], float)
        ys = np.array([p["excess_us"] for p in pts[-3:]], float)
        b = np.polyfit(xs, ys, 1)[0] * 1e3  # ns per block
        out[tag] = {"points": pts, "marginal_ns_per_block": round(b, 1)}
        print(f"{tag}: marginal per-block overhead {b:.0f} ns", flush=True)
    print("RESULT", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
