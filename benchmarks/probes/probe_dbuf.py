"""Double-buffered window DMA A/B (round 5).

The windowed kernels issue the per-block x-window copy SYNCHRONOUSLY
(cp.start(); cp.wait()) — the round-5 floor decomposition measured a
~160 ns/grid-step bubble that is exposed when the working set is
VMEM-resident (VMEM_FLOOR_r5.json).  This probe copies the dia-mode
kernel with a 2-slot pipelined window copy (start block b+1's DMA
before computing block b; scratch stays 3-D with a slot*H8 leading
offset so dynamic slicing keeps the fast leading-tile-dim path) and
A/Bs it against well_spmv on ico7-bench-class banded operators.
"""
import sys, time, json
from functools import partial
sys.path.insert(0, ".")
import numpy as np
import scipy.sparse as sp


def slope_ms(build, args, k_lo=256, k_hi=1024, reps=4):
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from surface_multigrid_code_tpu.ops.well import (
        B_ROWS, LANE, SUB, build_well_dia, well_spmv)

    print("device:", jax.devices()[0], flush=True)

    def band(n, half):
        offs = list(range(-half, half + 1))
        return sp.diags([np.ones(n - abs(o)) for o in offs], offs,
                        format="csr")

    results = {}
    for nb_target, half in ((161, 3), (161, 15), (41, 3)):
        n = nb_target * B_ROWS
        A = band(n, half)
        Ws = build_well_dia(A, dtype=jnp.float32, q=(1, 1))
        assert not isinstance(Ws, tuple) or len(Ws) == 1
        W = Ws[0] if isinstance(Ws, tuple) else Ws
        assert W.q == (1, 1), W.q
        x = jnp.ones((n,), jnp.float32)

        # ---- baseline ----
        def base_chain(k, W=W):
            @jax.jit
            def f(Wa, v0):
                def body(i, v):
                    y = well_spmv(Wa, v)
                    return y / jnp.sqrt(jnp.mean(y * y) + 1e-30)
                return jnp.sum(jax.lax.fori_loop(0, k, body, v0))
            return f
        t_base = slope_ms(base_chain, (W, x))

        # ---- double-buffered dia kernel (local replica) ----
        nb, w, H, XR = W.nb, W.w, W.H, W.XR
        qn, qd = W.q
        D = W.ht
        qf7 = (qn * (SUB - 1)) // qd
        T = [(D[k] - 1 + qf7) // 8 + 1 for k in range(w)]
        H8 = H // SUB
        XR8 = XR // SUB

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((w * SUB, LANE), lambda b, rb, ob: (b, 0)),
                pl.BlockSpec((w * SUB, LANE), lambda b, rb, ob: (b, 0)),
                pl.BlockSpec((w * SUB, LANE), lambda b, rb, ob: (b, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((SUB, LANE), lambda b, rb, ob: (b, 0)),
            scratch_shapes=[
                pltpu.VMEM((2 * H8, SUB, LANE), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )

        def dia_db(*refs):
            rb_ref, ob_ref, hi_ref, lo_ref, dat_ref, x_hbm, y_ref, win, \
                sem = refs
            b = pl.program_id(0)

            def cp_for(i, slot):
                rbt = rb_ref[i] // SUB
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(rbt, H8), :, :],
                    win.at[pl.ds(slot * H8, H8), :, :],
                    sem.at[slot],
                )

            slot = jax.lax.rem(b, 2)

            @pl.when(b == 0)
            def _():
                cp_for(0, 0).start()

            @pl.when(b + 1 < nb)
            def _():
                cp_for(b + 1, jax.lax.rem(b + 1, 2)).start()

            cp_for(b, slot).wait()
            acc = jnp.zeros((SUB, LANE), dtype=y_ref.dtype)
            for k in range(w):
                ot = ob_ref[b * w + k] + slot * H8
                ddk = hi_ref[k * SUB:(k + 1) * SUB, :]
                lok = lo_ref[k * SUB:(k + 1) * SUB, :]
                datk = dat_ref[k * SUB:(k + 1) * SUB, :]
                V2 = win[pl.ds(ot, T[k]), :, :].reshape(T[k] * SUB, LANE)
                g = jnp.zeros((SUB, LANE), dtype=jnp.float32)
                for d in range(D[k]):
                    tile_d = jax.lax.slice(
                        V2, (d, 0), (d + (SUB - 1) * qn + 1, LANE),
                        (qn, 1),
                    )
                    t = jnp.take_along_axis(tile_d, lok, axis=1)
                    g = jnp.where(ddk == d, t, g)
                acc = acc + datk * g
            y_ref[:, :] = acc

        @jax.jit
        def apply_db(W, v):
            x_pad = jnp.zeros((W.XR * LANE,), dtype=jnp.float32)
            x_pad = jax.lax.dynamic_update_slice(
                x_pad, v.astype(jnp.float32), (W.xpad * B_ROWS,))
            x3d = x_pad.reshape(XR8, SUB, LANE)
            y2d = pl.pallas_call(
                dia_db, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((nb * SUB, LANE),
                                               jnp.float32),
            )(W.rb, W.ob, W.hi, W.lo, W.dat, x3d)
            return y2d.reshape(-1)[: W.n_rows]

        # correctness
        rng = np.random.default_rng(0)
        xv = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        y_ref_ = np.asarray(well_spmv(W, xv))
        y_db = np.asarray(apply_db(W, xv))
        err = np.abs(y_db - y_ref_).max()

        def db_chain(k, W=W):
            @jax.jit
            def f(Wa, v0):
                def body(i, v):
                    y = apply_db(Wa, v)
                    return y / jnp.sqrt(jnp.mean(y * y) + 1e-30)
                return jnp.sum(jax.lax.fori_loop(0, k, body, v0))
            return f
        t_db = slope_ms(db_chain, (W, x))
        tag = f"nb{nb}_w{w}"
        results[tag] = {
            "t_base_ms": round(t_base, 5), "t_db_ms": round(t_db, 5),
            "speedup": round(t_base / max(t_db, 1e-9), 3),
            "max_abs_err": float(err),
        }
        print(tag, json.dumps(results[tag]), flush=True)
    print("RESULT", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
