"""Windowed-ELL (Pallas) SpMV kernel + ordering tests (interpret mode on CPU)."""
import numpy as np
import scipy.sparse as sp
import pytest

import jax.numpy as jnp

from surface_multigrid_code_tpu.ops.well import build_well, well_spmv, any_spmv
from surface_multigrid_code_tpu.solver.ordering import (
    finest_rcm,
    induced_orderings,
    permute_hierarchy,
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def _banded(rng, n=2000, half_bw=30, per_row=5):
    rows = np.repeat(np.arange(n), per_row)
    cols = np.clip(rows + rng.integers(-half_bw, half_bw + 1, size=rows.size), 0, n - 1)
    vals = rng.standard_normal(rows.size)
    return sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()


def test_well_spmv_banded(rng):
    A = _banded(rng)
    W = build_well(A, dtype=jnp.float32)
    x = rng.standard_normal(A.shape[0]).astype(np.float32)
    y = np.asarray(well_spmv(W, jnp.asarray(x)))
    ref = A @ x
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5


def test_well_spmv_rectangular(rng):
    n, m = 1500, 400
    rows = np.repeat(np.arange(n), 3)
    cols = np.clip((rows * m) // n + rng.integers(-8, 9, size=rows.size), 0, m - 1)
    P = sp.coo_matrix((rng.random(rows.size), (rows, cols)), shape=(n, m)).tocsr()
    W = build_well(P, dtype=jnp.float32)
    x = rng.standard_normal(m).astype(np.float32)
    y = np.asarray(well_spmv(W, jnp.asarray(x)))
    ref = P @ x
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5


def test_well_spmv_multirhs(rng):
    A = _banded(rng, n=800)
    W = build_well(A, dtype=jnp.float32)
    X = rng.standard_normal((A.shape[0], 3)).astype(np.float32)
    Y = np.asarray(any_spmv(W, jnp.asarray(X)))
    ref = A @ X
    assert np.abs(Y - ref).max() / np.abs(ref).max() < 1e-5


def test_well_empty_rows(rng):
    """Rows with no nonzeros (pruned columns / padding) must produce 0."""
    A = _banded(rng, n=700)
    A = A.tolil()
    A[5] = 0
    A[699] = 0
    A = A.tocsr()
    A.eliminate_zeros()
    W = build_well(A, dtype=jnp.float32)
    x = rng.standard_normal(700).astype(np.float32)
    y = np.asarray(well_spmv(W, jnp.asarray(x)))
    assert y[5] == 0.0 and y[699] == 0.0
    ref = A @ x
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5


def test_well_tap_layout_matches_scipy(rng):
    """Tap-recentered layout: correctness incl. group splitting, empty
    rows, rectangular shapes, and the pure-reshape value refresh."""
    from surface_multigrid_code_tpu.ops.well import (
        build_well_tap,
        well_repack_tap,
    )

    cases = [
        _banded(rng, n=2000, half_bw=30, per_row=5),
        _banded(rng, n=3000, half_bw=900, per_row=7),  # forces group split
    ]
    n, m = 1500, 400
    rows = np.repeat(np.arange(n), 3)
    cols = np.clip(
        (rows * m) // n + rng.integers(-8, 9, size=rows.size), 0, m - 1
    )
    cases.append(
        sp.coo_matrix(
            (rng.random(rows.size), (rows, cols)), shape=(n, m)
        ).tocsr()
    )
    A = _banded(rng, n=700).tolil()
    A[5] = 0
    A[699] = 0
    A = A.tocsr()
    A.eliminate_zeros()
    cases.append(A)

    for i, A in enumerate(cases):
        cap = 64 if i == 1 else 4096
        Ws = build_well_tap(A, dtype=jnp.float32, cap=cap)
        if i == 1:
            assert len(Ws) > 1  # the tight cap must actually split
        x = rng.standard_normal(A.shape[1]).astype(np.float32)
        y = np.asarray(any_spmv(Ws, jnp.asarray(x)))
        ref = A @ x
        assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5
        # value refresh through the canonical ELL array
        A2 = A.copy()
        A2.sort_indices()
        counts = np.diff(A2.indptr)
        w = sum(W.w for W in Ws)
        ell = np.zeros((A.shape[0], w), np.float32)
        if A2.nnz:
            r2 = np.repeat(np.arange(A.shape[0]), counts)
            o2 = np.arange(A2.nnz) - np.repeat(A2.indptr[:-1], counts)
            ell[r2, o2] = 2.0 * A2.data
        Ws2 = well_repack_tap(Ws, jnp.asarray(ell))
        y2 = np.asarray(any_spmv(Ws2, jnp.asarray(x)))
        assert np.abs(y2 - 2 * ref).max() / np.abs(ref).max() < 1e-5


def test_induced_orderings_are_permutations(rng):
    from surface_multigrid_code_tpu.ops.laplacian import cotmatrix, massmatrix
    from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute
    from surface_multigrid_code_tpu.utils.synthetic import icosphere

    V, F = icosphere(4)
    mg = mg_precompute(V, F, verbose=False)
    A = (massmatrix(V, F) - 0.01 * cotmatrix(V, F)).tocsr()
    As = [A]
    Ps = []
    for lv in range(1, len(mg)):
        P = mg[lv].P_full.tocsr()
        Ps.append(P)
        As.append((P.T @ As[-1] @ P).tocsr())
    perms = induced_orderings(finest_rcm(As[0]), Ps)
    assert len(perms) == len(As)
    for p, M in zip(perms, As):
        assert np.array_equal(np.sort(p), np.arange(M.shape[0]))
    As_p, Ps_p = permute_hierarchy(As, Ps, perms)
    # permuted Galerkin product must equal the permutation of the product
    for l in range(len(Ps)):
        G = (Ps_p[l].T @ As_p[l] @ Ps_p[l]).tocsr()
        d = abs(G - As_p[l + 1]).max()
        assert d < 1e-10


def test_well_end_to_end_solve_matches_ell(rng):
    import copy

    from surface_multigrid_code_tpu.config import SolveConfig, SmootherType
    from surface_multigrid_code_tpu.ops.laplacian import cotmatrix, massmatrix
    from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute
    from surface_multigrid_code_tpu.solver.mqwf_mg import (
        min_quad_with_fixed_mg_precompute,
        min_quad_with_fixed_mg_solve,
    )
    from surface_multigrid_code_tpu.utils.synthetic import icosphere

    V, F = icosphere(4)
    mg = mg_precompute(V, F, verbose=False)
    mg2 = copy.deepcopy(mg)
    A = (massmatrix(V, F) - 0.01 * cotmatrix(V, F)).tocsr()
    B = np.asarray(massmatrix(V, F) @ V[:, 0])
    cfg = SolveConfig(smoother=SmootherType.JACOBI)
    d0 = min_quad_with_fixed_mg_precompute(
        A, None, mg, cfg=cfg, dtype=jnp.float32, well=False
    )
    d1 = min_quad_with_fixed_mg_precompute(
        A, None, mg2, cfg=cfg, dtype=jnp.float32, well=True
    )
    z0, r0, ok0 = min_quad_with_fixed_mg_solve(
        d0, B, tolerance=1e-6, max_iter=10, refine=False
    )
    z1, r1, ok1 = min_quad_with_fixed_mg_solve(
        d1, B, tolerance=1e-6, max_iter=10, refine=False
    )
    assert ok0 and ok1 and len(r0) == len(r1)
    # compare trajectories above the f32 rounding floor (~1e-7 relative);
    # below it the two summation orders legitimately differ
    floor = 1e-6 * r0[0]
    cmp = [(a, b) for a, b in zip(r1, r0) if b > floor]
    if cmp:
        a, b = map(np.asarray, zip(*cmp))
        np.testing.assert_allclose(a, b, rtol=5e-3)
    assert np.abs(z1 - z0).max() / np.abs(z0).max() < 1e-4


def test_well_gs_solve_matches_ell(rng):
    """Multicolor GS through the windowed kernel (masked full SpMVs) must
    reproduce the gather-path GS trajectory: same colors per logical row
    (permuted with the hierarchy), same per-color residual math."""
    import copy

    from surface_multigrid_code_tpu.config import SolveConfig, SmootherType
    from surface_multigrid_code_tpu.ops.laplacian import cotmatrix, massmatrix
    from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute
    from surface_multigrid_code_tpu.solver.mqwf_mg import (
        min_quad_with_fixed_mg_precompute,
        min_quad_with_fixed_mg_solve,
    )
    from surface_multigrid_code_tpu.utils.synthetic import icosphere

    V, F = icosphere(4)
    mg = mg_precompute(V, F, verbose=False)
    mg2 = copy.deepcopy(mg)
    A = (massmatrix(V, F) - 0.01 * cotmatrix(V, F)).tocsr()
    B = np.asarray(massmatrix(V, F) @ V[:, 0])
    cfg = SolveConfig(smoother=SmootherType.MULTICOLOR_GS)
    d0 = min_quad_with_fixed_mg_precompute(
        A, None, mg, cfg=cfg, dtype=jnp.float32, well=False
    )
    d1 = min_quad_with_fixed_mg_precompute(
        A, None, mg2, cfg=cfg, dtype=jnp.float32, well=True
    )
    assert d1.hier.levels[0].group_mask  # masked path is active
    z0, r0, ok0 = min_quad_with_fixed_mg_solve(
        d0, B, tolerance=1e-6, max_iter=10, refine=False
    )
    z1, r1, ok1 = min_quad_with_fixed_mg_solve(
        d1, B, tolerance=1e-6, max_iter=10, refine=False
    )
    assert ok0 and ok1 and len(r0) == len(r1)
    floor = 1e-6 * r0[0]
    cmp = [(a, b) for a, b in zip(r1, r0) if b > floor]
    if cmp:
        a, b = map(np.asarray, zip(*cmp))
        np.testing.assert_allclose(a, b, rtol=5e-3)
    assert np.abs(z1 - z0).max() / np.abs(z0).max() < 1e-4


def test_refresh_solver_well_matches_ell(rng):
    from surface_multigrid_code_tpu.config import SolveConfig, SmootherType
    from surface_multigrid_code_tpu.ops.laplacian import cotmatrix, massmatrix
    from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute
    from surface_multigrid_code_tpu.solver.refresh import RefreshableMGSolver
    from surface_multigrid_code_tpu.utils.synthetic import icosphere

    V, F = icosphere(4)
    mg = mg_precompute(V, F, verbose=False)
    A = (massmatrix(V, F) - 0.01 * cotmatrix(V, F)).tocsr()
    A.sum_duplicates()
    A.sort_indices()
    rhs = np.asarray(massmatrix(V, F) @ V[:, 0])
    cfg = SolveConfig(smoother=SmootherType.JACOBI)
    s0 = RefreshableMGSolver(mg, A, cfg=cfg, dtype=jnp.float32, well=False)
    s1 = RefreshableMGSolver(mg, A, cfg=cfg, dtype=jnp.float32, well=True)
    assert s1.perm is not None
    # unconstrained + a value refresh on the same pattern
    for scale in (0.01, 0.03):
        A2 = (massmatrix(V, F) - scale * cotmatrix(V, F)).tocsr()
        A2.sum_duplicates()
        A2.sort_indices()
        z0, r0, ok0 = s0.solve(A2.data, rhs, tolerance=1e-6, max_iter=10)
        z1, r1, ok1 = s1.solve(A2.data, rhs, tolerance=1e-6, max_iter=10)
        assert ok0 and ok1 and len(r0) == len(r1)
        assert np.abs(z1 - z0).max() / np.abs(z0).max() < 1e-4
    # constrained
    b = np.arange(25, dtype=np.int64)
    kv = 0.1 * np.ones(b.size)
    s2 = RefreshableMGSolver(mg, A, known=b, cfg=cfg, dtype=jnp.float32, well=False)
    s3 = RefreshableMGSolver(mg, A, known=b, cfg=cfg, dtype=jnp.float32, well=True)
    z2, r2, _ = s2.solve(A.data, rhs, known_val=kv, tolerance=1e-6, max_iter=10)
    z3, r3, _ = s3.solve(A.data, rhs, known_val=kv, tolerance=1e-6, max_iter=10)
    assert len(r2) == len(r3)
    assert np.abs(z3 - z2).max() / np.abs(z2).max() < 1e-4


def test_mcf_stepper_well_matches_ell(rng):
    from surface_multigrid_code_tpu.config import SolveConfig, SmootherType
    from surface_multigrid_code_tpu.models.mcf import MCFStepper
    from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute
    from surface_multigrid_code_tpu.utils.mesh import normalize_unit_area
    from surface_multigrid_code_tpu.utils.synthetic import icosphere

    V, F = icosphere(4)
    V = normalize_unit_area(V, F)
    mg = mg_precompute(V, F, verbose=False)
    cfg = SolveConfig(smoother=SmootherType.JACOBI)
    s0 = MCFStepper(V, F, mg, cfg=cfg, dtype=jnp.float32, well=False)
    s1 = MCFStepper(V, F, mg, cfg=cfg, dtype=jnp.float32, well=True)
    assert s1.solver.perm is not None
    U0, U1 = V.copy(), V.copy()
    for _ in range(2):
        U0, r0, _ = s0.step(U0)
        U1, r1, _ = s1.step(U1)
        assert len(r0) == len(r1)
        assert np.abs(U1 - U0).max() / np.abs(U0).max() < 5e-5


def test_fused_epilogues_match_reference(rng):
    """well_apply epilogues (axpby/resid/add/resid_scaled) == dense math,
    across tap/auto/plain layouts and multi-group chaining."""
    from surface_multigrid_code_tpu.ops.well import (
        B_ROWS,
        build_well_auto,
        build_well_tap,
        well_apply,
    )

    A = _banded(rng, n=2500, half_bw=300, per_row=6)
    n = A.shape[0]
    x = rng.standard_normal(n)
    b = rng.standard_normal(n)
    u = rng.standard_normal(n)
    diag = np.abs(A.diagonal()) + 1.0
    nb = -(-n // B_ROWS)
    s = np.zeros(nb * B_ROWS)
    s[:n] = 1.0 / diag
    Ax = A @ x
    for W in (
        build_well_tap(A, dtype=jnp.float64),
        build_well_auto(A, dtype=jnp.float64),
        build_well_tap(A, dtype=jnp.float64, cap=64),  # forces 3 groups
        build_well(A, dtype=jnp.float64),
    ):
        xj, bj, uj, sj = (jnp.asarray(v) for v in (x, b, u, s))
        cases = [
            (well_apply(W, xj), Ax),
            (well_apply(W, xj, epi="resid", b=bj), b - Ax),
            (well_apply(W, xj, epi="add", u=uj), u + Ax),
            (
                well_apply(W, xj, epi="axpby", u=uj, b=bj, s=sj, escale=0.7),
                u + 0.7 * (b - Ax) / diag,
            ),
            (
                well_apply(W, xj, epi="resid_scaled", b=bj, s=sj, escale=1.3),
                1.3 * (b - Ax) / diag,
            ),
        ]
        for got, want in cases:
            assert np.abs(np.asarray(got) - want).max() < 1e-11


def test_diaq_phase_split_matches_scipy(rng):
    """Integer-slope phase-split layouts (build_well_diaq) reproduce A@x
    for restriction-shaped operators, incl. grouping and value refresh."""
    from surface_multigrid_code_tpu.ops.well import (
        _stage_ell,
        build_well_diaq,
        well_apply,
        well_repack_tap,
    )

    n_c, n_f, bw = 1500, 6000, 700
    rows = np.repeat(np.arange(n_c), 9)
    cols = np.clip(4 * rows + rng.integers(-bw, bw, rows.size), 0, n_f - 1)
    A = sp.coo_matrix(
        (rng.standard_normal(rows.size), (rows, cols)), shape=(n_c, n_f)
    ).tocsr()
    A.sum_duplicates()
    x = rng.standard_normal(n_f)
    b = rng.standard_normal(n_c)
    ref = A @ x
    for q in ((2, 1), (3, 1), (4, 1)):
        W = build_well_diaq(A, dtype=jnp.float64, q=q)
        assert np.abs(np.asarray(well_apply(W, jnp.asarray(x))) - ref).max() < 1e-11
        got = np.asarray(
            well_apply(W, jnp.asarray(x), epi="resid", b=jnp.asarray(b))
        )
        assert np.abs(got - (b - ref)).max() < 1e-11
    # grouped under a small unroll cap
    W = build_well_diaq(A, dtype=jnp.float64, q=(4, 1), cap=200)
    assert len(W) > 1
    assert np.abs(np.asarray(well_apply(W, jnp.asarray(x))) - ref).max() < 1e-11
    # canonical-slot value refresh doubles the operator
    _, _, val, _, _, _, _ = _stage_ell(A)
    W2 = well_repack_tap(W, jnp.asarray(2.0 * val[: A.shape[0]]))
    got = np.asarray(well_apply(W2, jnp.asarray(x)))
    assert np.abs(got - 2.0 * ref).max() < 1e-11


def test_tiled_vcycle_matches_unfused(rng):
    """The padded-flow fused V-cycle equals the unfused path bit-for-bit
    at f64 on the same windowed hierarchy (jacobi + multicolor-GS).
    cfg.tiled_vcycle is a static jit arg, so the two configs compile
    separately (an env toggle would be swallowed by the jit cache)."""
    from surface_multigrid_code_tpu.config import SolveConfig, SmootherType
    from surface_multigrid_code_tpu.ops.laplacian import cotmatrix, massmatrix
    from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute
    from surface_multigrid_code_tpu.solver.ordering import (
        finest_rcm,
        induced_orderings,
        permute_hierarchy,
    )
    from surface_multigrid_code_tpu.solver.vcycle import (
        build_device_hierarchy,
        solve_loop,
    )
    from surface_multigrid_code_tpu.utils.synthetic import icosphere

    V, F = icosphere(3)
    mg = mg_precompute(V, F, verbose=False)
    A = (massmatrix(V, F) - 0.01 * cotmatrix(V, F)).tocsr()
    As = [A]
    Ps = [mg[lv].P_full.tocsr() for lv in range(1, len(mg))]
    for P in Ps:
        As.append((P.T @ As[-1] @ P).tocsr())
    As, Ps = permute_hierarchy(As, Ps, induced_orderings(finest_rcm(A), Ps))
    rhs = rng.standard_normal(A.shape[0])
    for sm in (SmootherType.JACOBI, SmootherType.MULTICOLOR_GS):
        cfg = SolveConfig(smoother=sm)
        cfg_unfused = SolveConfig(smoother=sm, tiled_vcycle=False)
        hier = build_device_hierarchy(As, Ps, cfg=cfg, dtype=jnp.float64,
                                      well=True)
        args = (
            hier, jnp.asarray(rhs), jnp.zeros(rhs.shape), jnp.asarray(0.0), 4,
        )
        z1, r1, k1 = solve_loop(*args, cfg)
        z0, r0, k0 = solve_loop(*args, cfg_unfused)
        assert int(k0) == int(k1)
        assert np.abs(np.asarray(z1) - np.asarray(z0)).max() < 1e-12
        assert np.abs(np.asarray(r1) - np.asarray(r0)).max() < 1e-12


def test_well_spmv_planes_all_modes(rng):
    """Batched multi-RHS (planes) kernel vs per-column well_spmv across
    every window mode: legacy, tap-recentered, slope-1 dia, fractional
    dia, and integer-slope phase-split."""
    from surface_multigrid_code_tpu.ops.well import (
        build_well,
        build_well_dia,
        build_well_diaq,
        build_well_tap,
        well_apply,
    )

    A = _banded(rng, n=1800, half_bw=25, per_row=6)
    Xp = jnp.asarray(rng.standard_normal((3, A.shape[0])).astype(np.float32))
    ref = (A @ np.asarray(Xp).T).T
    layouts = [
        build_well(A, dtype=jnp.float32),
        build_well_tap(A, dtype=jnp.float32),
        build_well_dia(A, dtype=jnp.float32, q=(1, 1)),
        build_well_dia(A, dtype=jnp.float32, q=(1, 2)),
    ]
    for Ws in layouts:
        Yp = np.asarray(well_apply(Ws, Xp))
        assert np.abs(Yp - ref).max() / np.abs(ref).max() < 1e-5, type(Ws)

    # integer-slope (phase-split) mode needs a genuinely sloped operator
    n, m = 600, 2400
    rows = np.repeat(np.arange(n), 4)
    cols = np.clip(4 * rows + rng.integers(-6, 7, size=rows.size), 0, m - 1)
    PT = sp.coo_matrix(
        (rng.random(rows.size), (rows, cols)), shape=(n, m)
    ).tocsr()
    Wq = build_well_diaq(PT, dtype=jnp.float32, q=(4, 1))
    Xq = jnp.asarray(rng.standard_normal((2, m)).astype(np.float32))
    refq = (PT @ np.asarray(Xq).T).T
    Yq = np.asarray(well_apply(Wq, Xq))
    assert np.abs(Yq - refq).max() / np.abs(refq).max() < 1e-5


def test_well_planes_fused_epilogues(rng):
    """Planes-mode fused epilogues (axpby / resid / add / resid_scaled)
    match the per-column fused path on every column."""
    from surface_multigrid_code_tpu.ops.well import build_well_tap, well_apply

    A = _banded(rng, n=1100, half_bw=20, per_row=5)
    n = A.shape[0]
    Ws = build_well_tap(A, dtype=jnp.float32)
    C = 3
    Xp = jnp.asarray(rng.standard_normal((C, n)).astype(np.float32))
    Bp = jnp.asarray(rng.standard_normal((C, n)).astype(np.float32))
    Up = jnp.asarray(rng.standard_normal((C, n)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    cases = [
        ("axpby", dict(u=Up, b=Bp, s=s, escale=0.7)),
        ("resid", dict(b=Bp)),
        ("add", dict(u=Up)),
        ("resid_scaled", dict(b=Bp, s=s, escale=1.3)),
    ]
    for epi, kw in cases:
        Yp = np.asarray(well_apply(Ws, Xp, epi=epi, **kw))
        for c in range(C):
            kw1 = {
                k: (v[c] if k in ("u", "b") else v) for k, v in kw.items()
            }
            y1 = np.asarray(well_apply(Ws, Xp[c], epi=epi, **kw1))
            assert np.abs(Yp[c] - y1).max() < 1e-5 * max(
                1.0, np.abs(y1).max()
            ), epi


def test_well_block3_matches_scipy(rng):
    """3x3-block windowed SpMV (well_spmv_block3): shared select chain +
    9-component contraction vs a scipy block product, across layouts."""
    import scipy.sparse as sp
    from surface_multigrid_code_tpu.ops.well import (
        build_well,
        build_well_dia,
        build_well_tap,
        well_block3_apply,
        well_repack_tap,
    )

    n = 1200
    A = _banded(rng, n=n, half_bw=20, per_row=5).tocsr()
    A.sum_duplicates()
    A.sort_indices()
    counts = np.diff(A.indptr)
    w = int(counts.max())
    blocks = rng.standard_normal((A.nnz, 3, 3))
    # scipy oracle: expand to 3n x 3n BSR
    bsr = sp.bsr_matrix(
        (blocks, A.indices, A.indptr), shape=(3 * n, 3 * n)
    ).tocsr()
    X = rng.standard_normal((n, 3))
    ref = (bsr @ X.reshape(-1)).reshape(n, 3)

    # canonical [n, w] ELL planes of the 9 block components
    rows = np.repeat(np.arange(n), counts)
    offs = np.arange(A.nnz) - np.repeat(A.indptr[:-1], counts)
    xp = jnp.asarray(X.T.astype(np.float32))
    for builder in (build_well, build_well_tap,
                    lambda M, dtype: build_well_dia(M, dtype=dtype, q=(1, 1))):
        Ws = builder(A, dtype=jnp.float32)
        Wt = Ws if isinstance(Ws, tuple) else (Ws,)
        dats_groups = []
        k0 = 0
        planes_all = []
        for i in range(3):
            for j in range(3):
                ell = np.zeros((n, w), dtype=np.float64)
                ell[rows, offs] = blocks[:, i, j]
                planes_all.append(ell)
        for W in Wt:
            dats = tuple(
                well_repack_tap(W, jnp.asarray(p[:, k0:k0 + W.w],
                                               dtype=jnp.float32)).dat
                for p in planes_all
            )
            dats_groups.append(dats)
            k0 += W.w
        Y = np.asarray(well_block3_apply(Wt, xp, tuple(dats_groups)))
        Y = Y[:, :n].T
        err = np.abs(Y - ref).max() / np.abs(ref).max()
        assert err < 1e-5, (builder, err)
