"""Honest MCF per-step TPU timing (readback-forced chained-step slope).

The mean-curvature-flow step (reference 05_example_mean_curvature_flow/
main.cpp:53-80): device mass assembly -> Galerkin value refresh ->
[n,3]-RHS V-cycle iterate to tol 5e-7 -> area renormalization, all one
dispatch (models/mcf.py). Chained steps share one compiled program via a
traced fori bound; per-step cost is the slope between two chain lengths
(cancels the ~29 ms scalar-readback constant).

Usage: python benchmarks/probes/probe_mcf_step.py [mesh] [smoother]
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

from surface_multigrid_code_tpu.config import (  # noqa: E402
    SmootherType,
    SolveConfig,
)
from surface_multigrid_code_tpu.models.mcf import MCFStepper  # noqa: E402
from surface_multigrid_code_tpu.solver.hierarchy import (  # noqa: E402
    mg_precompute,
)
from surface_multigrid_code_tpu.utils.mesh import (  # noqa: E402
    normalize_unit_area,
)
from surface_multigrid_code_tpu.utils.obj_io import read_obj  # noqa: E402
from surface_multigrid_code_tpu.utils.paths import mesh_path  # noqa: E402


def main():
    mesh = sys.argv[1] if len(sys.argv) > 1 else "bunny"
    smoother = sys.argv[2] if len(sys.argv) > 2 else "multicolor_gs"
    print(f"device: {jax.devices()[0]}", flush=True)
    V, F = read_obj(mesh_path(mesh))
    V = normalize_unit_area(V, F)
    t0 = time.time()
    mg = mg_precompute(V, F, verbose=False)
    t_hier = time.time() - t0
    cfg = SolveConfig(smoother=SmootherType[smoother.upper()])
    t0 = time.time()
    stepper = MCFStepper(V, F, mg, cfg=cfg)
    t_build = time.time() - t0
    print(f"hier {t_hier:.1f}s, stepper build {t_build:.1f}s", flush=True)

    state = stepper._mcf_state
    dtype = jnp.float32

    def chain(st, U, K):
        def body(i, u):
            return stepper._step_fn(st, u)[0].astype(dtype)

        return jnp.sum(jax.lax.fori_loop(0, K, body, U))

    f = jax.jit(chain)
    U0 = jnp.asarray(V, dtype=dtype)
    t0 = time.time()
    chk = float(f(state, U0, jnp.int32(1)))
    print(f"compile+step1 {time.time()-t0:.1f}s chk={chk:.5e}", flush=True)

    ts = {}
    for K in (1, 5):
        best = float("inf")
        for _ in range(5):
            t0 = time.time()
            chk = float(f(state, U0, jnp.int32(K)))
            best = min(best, time.time() - t0)
        ts[K] = best
        print(f"K={K}: {best:.4f}s (chk {chk:.5e})", flush=True)
    per = (ts[5] - ts[1]) / 4.0

    # convergence sanity on the same trajectory (host wrapper)
    U1, r_his, ok = stepper.step(np.asarray(V))
    out = {
        "mesh": f"{mesh} |V|={V.shape[0]} |F|={F.shape[0]}",
        "smoother": smoother,
        "mg_tol": 5e-7,
        "t_step_ms": round(per * 1e3, 2),
        "slope_basis": {"K1_s": round(ts[1], 4), "K5_s": round(ts[5], 4)},
        "step1_cycles": len(r_his),
        "step1_r_last": r_his[-1] if r_his else None,
        "step1_converged": ok,
        "t_hierarchy_s": round(t_hier, 1),
        "t_stepper_build_s": round(t_build, 1),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
