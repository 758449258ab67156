"""A/B: MXU dense-band SpMV vs the VPU select-chain windowed kernel.

The round-2 verdict asked for this A/B before accepting the VPU kernel's
cost-model floor: per 1024-row block, materialize the dense
1024 x (span*128) band of the RCM-ordered operator and drive the MXU with
a batched band @ window matmul (windows are contiguous x slices under the
banded ordering, so no gather anywhere).

The band formulation's traffic is rows*span*bytes vs the windowed
kernel's ~nnz*12B — a (span*128/nnz_per_row)/3 ~ 30-90x blowup for
7-nnz/row cotan operators — so it can only win if the MXU time hides it
AND many RHS columns amortize the band reads. This probe measures the
best case honestly: NC=128 RHS columns (the MXU's native tile), f32 and
bf16 bands, readback-forced slope timing, vs the windowed planes kernel
on the same operator at C=3 (the real workload's column count).

Usage: python benchmarks/probes/probe_mxu_band.py [order] [bf16 0/1] [CW]
"""
import faulthandler
import json
import sys
import time

faulthandler.dump_traceback_later(600, repeat=True)

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from benchmarks.probes.ico_ops_cache import load_ops  # noqa: E402
from surface_multigrid_code_tpu.ops.well import (  # noqa: E402
    B_ROWS,
    LANE,
    build_well_auto,
    well_apply,
)

NC = 128  # RHS columns (MXU-native); the real workloads use 1-3


def main():
    order = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    use_bf16 = bool(int(sys.argv[2])) if len(sys.argv) > 2 else False
    CW = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    band_dt = jnp.bfloat16 if use_bf16 else jnp.float32
    print(f"device: {jax.devices()[0]}", flush=True)
    As, _Ps = load_ops(order)
    A = As[0].tocsr()
    A.sum_duplicates()
    n = A.shape[0]
    nb = -(-n // B_ROWS)

    # per-block element-aligned window starts + max span (elements)
    counts = np.diff(A.indptr)
    rows = np.repeat(np.arange(n), counts)
    blk = rows // B_ROWS
    rb_el = np.zeros(nb, dtype=np.int64)
    span_el = np.full(nb, CW, dtype=np.int64)
    for b in range(nb):
        m = blk == b
        if m.any():
            c = A.indices[m]
            rb_el[b] = (c.min() // B_ROWS) * B_ROWS  # align to 1024 elems
            span_el[b] = c.max() - rb_el[b] + 1
    Wmax = int(-(-span_el.max() // CW) * CW)
    band_bytes = nb * B_ROWS * Wmax * (2 if use_bf16 else 4)
    print(f"n={n} nb={nb} Wmax={Wmax} band={band_bytes/1e9:.2f} GB "
          f"dtype={band_dt.__name__}", flush=True)
    if band_bytes > 6e9:
        print(json.dumps({"order": order, "skipped": "band exceeds 6 GB"}))
        return

    band = np.zeros((nb * B_ROWS, Wmax), dtype=np.float32)
    loc = A.indices - rb_el[blk]
    band[rows, loc] = A.data
    band_d = jax.device_put(jnp.asarray(band, dtype=band_dt))
    del band

    n_pad_x = int(max(rb_el.max() + Wmax, nb * B_ROWS))
    rng = np.random.default_rng(0)
    X0 = jnp.asarray(
        rng.standard_normal((n_pad_x, NC)).astype(np.float32))
    rb_d = jnp.asarray(rb_el.astype(np.int32))

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nw = Wmax // CW
    SUBO = B_ROWS // LANE

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, nw),
        in_specs=[
            pl.BlockSpec((B_ROWS, CW), lambda b, j, rb: (b, j)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((B_ROWS, NC), lambda b, j, rb: (b, 0)),
        scratch_shapes=[
            # window scratch stays f32 (bf16 (16,128) tiling breaks the
            # dynamic-start DMA proof); cast to band_dt before the dot —
            # the band reads are the traffic under test, not the window
            pltpu.VMEM((CW, NC), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    def band_kernel(rb_ref, band_ref, x_hbm, y_ref, win, sem):
        b = pl.program_id(0)
        j = pl.program_id(1)
        start = rb_ref[b] + j * CW
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(start, CW), :], win, sem)
        cp.start()
        cp.wait()

        @pl.when(j == 0)
        def _():
            y_ref[:, :] = jnp.zeros((B_ROWS, NC), dtype=y_ref.dtype)

        y_ref[:, :] += jax.lax.dot(
            band_ref[:, :], win[:, :].astype(band_dt),
            preferred_element_type=jnp.float32,
        )

    def band_spmv(band_a, xc):
        y = pl.pallas_call(
            band_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb * B_ROWS, NC), jnp.float32),
        )(rb_d, band_a, xc)
        return y

    def chain_band(band_a, x, K):
        def body(i, x):
            y = band_spmv(band_a, x)
            y = y / jnp.sqrt(jnp.mean(y * y) + 1e-30)
            out = jnp.zeros((n_pad_x, NC), dtype=jnp.float32)
            return jax.lax.dynamic_update_slice(out, y, (0, 0))

        return jnp.sum(jax.lax.fori_loop(0, K, body, x))

    f = jax.jit(chain_band)
    t0 = time.time()
    chk = float(f(band_d, X0, jnp.int32(1)))
    print(f"band compile+1 {time.time()-t0:.1f}s chk={chk:.4e}", flush=True)
    ts = {}
    for K in (8, 40):
        best = float("inf")
        for _ in range(4):
            t0 = time.time()
            chk = float(f(band_d, X0, jnp.int32(K)))
            best = min(best, time.time() - t0)
        ts[K] = best
        print(f"band K={K}: {best:.4f}s", flush=True)
    per_band = (ts[40] - ts[8]) / 32.0

    # reference point: windowed planes kernel at C=3 on the same operator
    Ws = build_well_auto(A, dtype=jnp.float32)
    Xp = jnp.asarray(rng.standard_normal((3, n)).astype(np.float32))

    def chain_well(ws, xp, K):
        def body(i, x):
            y = well_apply(ws, x)
            return y / jnp.sqrt(jnp.mean(y * y) + 1e-30)

        return jnp.sum(jax.lax.fori_loop(0, K, body, xp))

    fw = jax.jit(chain_well)
    float(fw(Ws, Xp, jnp.int32(8)))
    tws = {}
    for K in (32, 160):
        best = float("inf")
        for _ in range(4):
            t0 = time.time()
            float(fw(Ws, Xp, jnp.int32(K)))
            best = min(best, time.time() - t0)
        tws[K] = best
    per_well3 = (tws[160] - tws[32]) / 128.0

    gbps = band_bytes / per_band / 1e9
    out = {
        "order": order,
        "n": n,
        "nnz": int(A.nnz),
        "band_dtype": band_dt.__name__,
        "Wmax": Wmax,
        "band_GB": round(band_bytes / 1e9, 3),
        "NC": NC,
        "band_spmv_ms": round(per_band * 1e3, 3),
        "band_achieved_GBps": round(gbps, 1),
        "band_ms_per_3cols_if_only_3_needed": round(per_band * 1e3, 3),
        "well_planes_C3_ms": round(per_well3 * 1e3, 4),
        "band_vs_well_C3": round(per_band / per_well3, 2),
        "band_per_col_ms": round(per_band * 1e3 / NC, 4),
        "well_per_col_ms": round(per_well3 * 1e3 / 3, 4),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
