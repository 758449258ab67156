"""Sharded MCF stepper (parallel/mcf.py) vs the single-device stepper."""

import numpy as np

import jax.numpy as jnp

from surface_multigrid_code_tpu.config import SolveConfig, SmootherType
from surface_multigrid_code_tpu.models.mcf import MCFStepper
from surface_multigrid_code_tpu.parallel.mcf import ShardedMCFStepper
from surface_multigrid_code_tpu.parallel.spmd import make_row_mesh
from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute
from surface_multigrid_code_tpu.utils.mesh import doublearea, normalize_unit_area
from surface_multigrid_code_tpu.utils.synthetic import icosphere


def bumpy_sphere():
    V, F = icosphere(3)
    V = V * (1.0 + 0.1 * np.sin(5 * V[:, [0]]) * np.cos(5 * V[:, [1]]))
    return normalize_unit_area(V, F), F


def test_sharded_mcf_matches_single_device():
    V, F = bumpy_sphere()
    mg = mg_precompute(V, F, min_coarsest_nv=100, verbose=False)
    cfg = SolveConfig(smoother=SmootherType.JACOBI)

    single = MCFStepper(V, F, mg, cfg=cfg, dtype=jnp.float64)
    sharded = ShardedMCFStepper(
        V, F, mg, make_row_mesh(4), cfg=cfg, dtype=jnp.float64
    )

    U1, U4 = V.copy(), V.copy()
    for _ in range(3):
        U1, r1, ok1 = single.step(U1)
        U4, r4, ok4 = sharded.step(U4)
        assert ok1 and ok4, (r1, r4)
        # both solve to |r| <= 5e-7 absolute; the flows agree to that level
        np.testing.assert_allclose(U4, U1, atol=5e-6)

    assert abs(doublearea(U4, F).sum() / 2.0 - 1.0) < 1e-6


def test_sharded_mcf_ssp_exact_cancellation_pattern():
    # regression: SSP prolongations carry exact-zero barycentric weights
    # whose products scipy's numeric PtAP drops, de-syncing the stored
    # chain from the symbolic refresh plan (found at icosphere(4) scale —
    # enable_refresh now validates, galerkin_chain builds the full pattern)
    V, F = icosphere(4)
    V = normalize_unit_area(V, F)
    mg = mg_precompute(V, F, verbose=False)
    cfg = SolveConfig(smoother=SmootherType.JACOBI)
    single = MCFStepper(V, F, mg, cfg=cfg, dtype=jnp.float64)
    sharded = ShardedMCFStepper(
        V, F, mg, make_row_mesh(4), cfg=cfg, dtype=jnp.float64
    )
    U1, r1, ok1 = single.step(V.copy())
    U4, r4, ok4 = sharded.step(V.copy())
    assert ok1 and ok4, (r1, r4)
    np.testing.assert_allclose(U4, U1, atol=1e-10)


def test_sharded_mcf_smooths():
    V, F = bumpy_sphere()
    mg = mg_precompute(V, F, min_coarsest_nv=100, verbose=False)
    stepper = ShardedMCFStepper(V, F, mg, make_row_mesh(8), dtype=jnp.float64)

    def roughness(X):
        C = X - X.mean(axis=0)
        r = np.linalg.norm(C, axis=1)
        return r.std() / r.mean()

    U = V.copy()
    for _ in range(3):
        U, r_his, ok = stepper.step(U)
        assert ok, r_his
    assert roughness(U) < 0.7 * roughness(V)
