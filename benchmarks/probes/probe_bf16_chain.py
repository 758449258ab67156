"""A/B: select-chain cost per window row, f32 8-row vs bf16 16-row tiles.

The windowed kernel (ops/well.py) is select-bound: per candidate it runs
one lane take_along_axis + one sublane one-hot select over an 8x128 f32
tile (~2 VPU tile-ops / 8 window rows).  bf16's native tile is 16x128,
so IF Mosaic executes 16-row bf16 gather/select as single tile-ops, the
same window coverage costs half the chain — a ~2x V-cycle lever.  The
catch: the int32 index compares (dd == c) on a 16x128 shape are TWO
native int32 tiles, so the win depends on whether the mask/select mix
stays ~1 op.  This probe times the REAL loop body shape at matched
window coverage (rows processed per chain) and prints ns per window row
for both variants, readback-forced slope over two chained-iteration
counts (CLAUDE.md timing methodology).

Run in a FRESH process on the TPU: python benchmarks/probes/probe_bf16_chain.py
"""
import json
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

LANE = 128
H = 64          # window sublane rows (mid-range for surface operators)
NB = 160        # grid blocks (~ico7 finest level)


def make_chain(rows_per_cand: int, dtype):
    """pallas kernel: one output tile per block; chain over H window rows
    in rows_per_cand steps, each = slice + take_along_axis + one-hot
    select, accumulating like the real kernel's tap loop."""
    from jax.experimental import pallas as pl

    ncand = H // rows_per_cand
    SUBv = rows_per_cand

    def kernel(lo_ref, dd_ref, dat_ref, win_ref, y_ref):
        g = jnp.zeros((SUBv, LANE), dtype=dtype)
        lo = lo_ref[:, :]
        dd = dd_ref[:, :]
        for j in range(ncand):
            tile = jax.lax.slice(
                win_ref[:, :], (j * SUBv, 0), ((j + 1) * SUBv, LANE)
            )
            t = jnp.take_along_axis(tile, lo, axis=1)
            g = jnp.where(dd == j, t, g)
        y_ref[:, :] = dat_ref[:, :] * g

    return pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((SUBv, LANE), lambda b: (b, 0)),
            pl.BlockSpec((SUBv, LANE), lambda b: (b, 0)),
            pl.BlockSpec((SUBv, LANE), lambda b: (b, 0)),
            pl.BlockSpec((H, LANE), lambda b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((SUBv, LANE), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((NB * SUBv, LANE), dtype),
    )


def time_variant(rows_per_cand: int, dtype, iters=(64, 256)):
    SUBv = rows_per_cand
    rng = np.random.default_rng(0)
    lo = jnp.asarray(rng.integers(0, LANE, (NB * SUBv, LANE)), jnp.int32)
    dd = jnp.asarray(
        rng.integers(0, H // SUBv, (NB * SUBv, LANE)), jnp.int32
    )
    dat = jnp.asarray(rng.standard_normal((NB * SUBv, LANE)), dtype)
    win = jnp.asarray(rng.standard_normal((NB * H, LANE)), dtype)
    f1 = make_chain(rows_per_cand, dtype)

    @partial(jax.jit, static_argnames=("k",))
    def chained(lo, dd, dat, win, k):
        def body(i, w):
            y = f1(lo, dd, dat, w)
            # feed y back into the window so iterations are data-dependent
            return jax.lax.dynamic_update_slice(w, y.astype(dtype), (0, 0))
        w = jax.lax.fori_loop(0, k, body, win)
        return jnp.sum(w[:8].astype(jnp.float32))

    t_at = {}
    for k in iters:
        float(chained(lo, dd, dat, win, k=k))  # compile
        best = float("inf")
        for _ in range(5):
            t0 = time.time()
            float(chained(lo, dd, dat, win, k=k))
            best = min(best, time.time() - t0)
        t_at[k] = best
    per_call = (t_at[iters[1]] - t_at[iters[0]]) / (iters[1] - iters[0])
    rows_processed = NB * H  # window rows covered per call
    return per_call, per_call / rows_processed * 1e9


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    out = {}
    for name, rpc, dt in (
        ("f32_8row", 8, jnp.float32),
        ("bf16_16row", 16, jnp.bfloat16),
        ("bf16_8row", 8, jnp.bfloat16),
        ("f32_16row", 16, jnp.float32),
    ):
        try:
            per_call, ns_per_row = time_variant(rpc, dt)
            out[name] = {
                "per_call_us": round(per_call * 1e6, 3),
                "ns_per_window_row": round(ns_per_row, 4),
            }
            print(f"{name}: {out[name]}", flush=True)
        except Exception as e:  # Mosaic rejection is a result too
            out[name] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
            print(f"{name}: FAILED {out[name]['error']}", flush=True)
    if "ns_per_window_row" in out.get("f32_8row", {}) and \
       "ns_per_window_row" in out.get("bf16_16row", {}):
        out["bf16_speedup"] = round(
            out["f32_8row"]["ns_per_window_row"]
            / out["bf16_16row"]["ns_per_window_row"], 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
