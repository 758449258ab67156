"""Query engine: device (batched lax.map walk) vs host (OpenMP walk).

Measures fine->coarse query throughput at 10K..1M random surface points on
an icosphere-7 decimation log and reports the device/host crossover.  The
reference's query loop is igl-parallel_for over points
(src/query_fine_to_coarse.cpp:23-127); our host engine mirrors it with
OpenMP, and the device engine runs the same walk as one dispatch of
chunked lockstep gathers (query/device.py).

Usage: python benchmarks/query_bench.py [depth=6]
Prints one JSON line.
"""

import json
import sys
import time

import numpy as np


def main(depth: int = 6):
    import jax

    from surface_multigrid_code_tpu.query.device import (
        pad_log,
        query_fine_to_coarse_device,
    )
    from surface_multigrid_code_tpu.query.maps import query_fine_to_coarse
    from surface_multigrid_code_tpu.ssp.decimate import SSP_decimate
    from surface_multigrid_code_tpu.utils.synthetic import icosphere

    V, F = icosphere(depth)
    t0 = time.time()
    ok, Vc, Fc, IMF, IM, log = SSP_decimate(V, F, max(320, F.shape[0] // 64), 1)
    assert ok
    t_dec = time.time() - t0
    t0 = time.time()
    dlog = pad_log(log)
    t_pad = time.time() - t0

    rng = np.random.default_rng(0)
    results = {}
    crossover = None
    for n in (10_000, 100_000, 1_000_000):
        fids = rng.integers(0, F.shape[0], n)
        bc = rng.dirichlet(np.ones(3), n)
        bf = F[fids]

        t0 = time.time()
        h = query_fine_to_coarse(log, bc, bf, fids)
        t_host = time.time() - t0

        # warm (compile) then time; device arrays in, one dispatch
        d = query_fine_to_coarse_device(dlog, bc, bf, fids)
        t0 = time.time()
        d = query_fine_to_coarse_device(dlog, bc, bf, fids)
        t_dev = time.time() - t0

        pos_h = (h[0][:, :, None] * Vc[h[1]]).sum(1)
        pos_d = (d[0][:, :, None] * Vc[d[1]]).sum(1)
        err = np.linalg.norm(pos_h - pos_d, axis=1)
        results[n] = {
            "host_s": round(t_host, 3),
            "device_s": round(t_dev, 3),
            "speedup": round(t_host / t_dev, 2),
            "median_err": float(np.median(err)),
            "agree_1e3": float((err < 1e-3).mean()),
        }
        if crossover is None and t_dev < t_host:
            crossover = n

    print(
        json.dumps(
            {
                "mesh": f"icosphere{depth} |F|={F.shape[0]}",
                "log_records": int(log["voff"].shape[0] - 1),
                "device": str(jax.devices()[0]),
                "t_decimate_s": round(t_dec, 1),
                "t_pad_log_s": round(t_pad, 1),
                "device_faster_at_n": crossover,
                "by_n": results,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 6)
