"""Balloon step component profile (round 3): where do the ms go?

Readback-forced slope timings of the BSR balloon step's stages on
bunny_15K at the reference pressure 1e6: per-face Hessian assembly with/
without PSD projection (eigh), the eigh alone, the windowed Galerkin
refresh, one refreshed solve, and the full step — plus the step with
power-iteration lam (monkeypatched) to separate the Gershgorin-window
cost from the projection cost.

Usage: python benchmarks/probes/probe_balloon_profile_r3.py
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

from surface_multigrid_code_tpu.models.balloon import (  # noqa: E402
    BsrBalloonStepper,
    lumped_mass_matrix,
    vertex_normals,
)
from surface_multigrid_code_tpu.models.shell import (  # noqa: E402
    ShellEnergy,
    lame_parameters,
)
from surface_multigrid_code_tpu.ops.laplacian import massmatrix  # noqa: E402
from surface_multigrid_code_tpu.solver.hierarchy import (  # noqa: E402
    mg_precompute,
)
from surface_multigrid_code_tpu.utils.obj_io import read_obj  # noqa: E402
from surface_multigrid_code_tpu.utils.paths import mesh_path  # noqa: E402


def slope_time(f, args, klo, khi, reps=4):
    ts = {}
    for K in (klo, khi):
        float(f(*args, jnp.int32(K)))
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            float(f(*args, jnp.int32(K)))
            best = min(best, time.time() - t0)
        ts[K] = best
    return (ts[khi] - ts[klo]) / (khi - klo)


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    V, F = read_obj(mesh_path("bunny_15K_init"))
    nv = V.shape[0]
    al, be = lame_parameters(6e6, 0.5 - 1e-3)
    shell = ShellEnergy(V, F, 1e-1, al, be, "neohookean")
    M = 1000.0 * lumped_mass_matrix(V, F)
    mg = mg_precompute(V, F, verbose=False)
    out = {}

    def build(project):
        return BsrBalloonStepper(
            shell, M, mg, 1e-3, mg_tolerance=2e-1, psd_project=project)

    st_time = time.time()
    stepper = build(True)
    print(f"stepper build {time.time()-st_time:.0f}s", flush=True)
    st = stepper._state
    Nrm = vertex_normals(V, F)
    Mvd = np.asarray(massmatrix(V, F, kind="voronoi").diagonal())
    fExt3 = -(Nrm * Mvd[:, None]) * 1e6
    Vp = V
    if stepper._vperm is not None:
        Vp = V[stepper._vperm]
        fExt3 = fExt3[stepper._vperm]
    fExt = jnp.asarray(fExt3.reshape(-1), dtype=stepper.dtype)
    xv = jnp.asarray(Vp, dtype=stepper.dtype)
    x_flat = xv.reshape(-1)
    qd0 = jnp.zeros(3 * nv, dtype=stepper.dtype)

    # 1. eigh alone on the per-face Hessians
    x9 = xv[st["F"]].reshape(-1, 9)
    H9 = shell._face_hess(x9, st["abars"])

    def eigh_chain(H, K):
        def body(i, h):
            w, U = jnp.linalg.eigh(0.5 * (h + jnp.swapaxes(h, -1, -2)))
            hp = jnp.einsum("fij,fj,fkj->fik", U, jnp.maximum(w, 0.0), U)
            return hp + 1e-12 * i
        return jnp.sum(jax.lax.fori_loop(0, K, body, H))

    out["eigh_project_ms"] = round(
        slope_time(jax.jit(eigh_chain), (H9,), 2, 8) * 1e3, 2)
    print(f"eigh+reconstruct per call: {out['eigh_project_ms']} ms",
          flush=True)

    # 2. assembly (block_vals) with projection on/off
    for tag, proj in (("asm_psd", True), ("asm_raw", False)):
        sp_ = stepper if proj else build(False)

        def asm_chain(s, x0, K, sp_=sp_):
            def body(i, x):
                v = sp_._block_vals(s, x)
                return x + 1e-30 * v[:, 0, 0].sum()
            return jnp.sum(jax.lax.fori_loop(0, K, body, x0))

        out[tag + "_ms"] = round(
            slope_time(jax.jit(asm_chain),
                       (sp_._state, x_flat), 2, 8) * 1e3, 2)
        print(f"{tag}: {out[tag + '_ms']} ms", flush=True)

    # 3. refresh alone (windowed chain + lam + coarse chol)
    vals = stepper._block_vals(st, x_flat)

    def refresh_chain(s, v, K):
        def body(i, acc):
            h = stepper.solver._refresh_impl(s, v + 1e-30 * i)
            return acc + h.levels[0].diag[0, 0]
        return jax.lax.fori_loop(0, K, body, jnp.asarray(0.0, stepper.dtype))

    out["refresh_ms"] = round(
        slope_time(jax.jit(refresh_chain), (st["solver"], vals), 2, 8) * 1e3,
        2)
    print(f"refresh: {out['refresh_ms']} ms", flush=True)

    # 4. refreshed solve at tol 2e-1 from a realistic first-Newton state
    from surface_multigrid_code_tpu.solver.bsr import bsr_solve_loop

    g = -(st["Mdiag"] * qd0 + 1e-3 * fExt)

    def solve_chain(s, v, gg, K):
        hier = stepper.solver._refresh_impl(s, v)

        def body(i, acc):
            dx, _r, kk = bsr_solve_loop(
                hier, gg.reshape(nv, 3) * (1 + 1e-30 * i),
                jnp.zeros((nv, 3), dtype=stepper.dtype),
                jnp.asarray(2e-1, stepper.dtype), 20, stepper.solver.cfg)
            return acc + dx[0, 0] + kk.astype(stepper.dtype)
        return jax.lax.fori_loop(0, K, body,
                                 jnp.asarray(0.0, stepper.dtype))

    out["solve_tol2e-1_ms"] = round(
        slope_time(jax.jit(solve_chain), (st["solver"], vals, g), 2, 8)
        * 1e3, 2)
    # cycles taken
    hier = stepper.solver._refresh_impl(st["solver"], vals)
    _dx, _r, kk = bsr_solve_loop(
        hier, g.reshape(nv, 3), jnp.zeros((nv, 3), dtype=stepper.dtype),
        jnp.asarray(2e-1, stepper.dtype), 20, stepper.solver.cfg)
    out["solve_cycles_gersh"] = int(kk)
    print(f"solve: {out['solve_tol2e-1_ms']} ms, cycles {int(kk)}",
          flush=True)

    # 4b. same solve with power-iteration lam (monkeypatch)
    import surface_multigrid_code_tpu.solver.bsr as bsrmod

    orig = bsrmod.BsrRefreshableSolver._lam

    def _lam_power(self, A, diag3, lv, n_levels, lam_in):
        from surface_multigrid_code_tpu.solver.bsr import _bsr_device_lam_max
        from surface_multigrid_code_tpu.config import SmootherType as S
        if self.cfg.smoother != S.CHEBYSHEV or lv >= n_levels - 1:
            return None
        return _bsr_device_lam_max(A, diag3)

    bsrmod.BsrRefreshableSolver._lam = _lam_power
    try:
        out["solve_power_ms"] = round(
            slope_time(jax.jit(solve_chain), (st["solver"], vals, g), 2, 8)
            * 1e3, 2)
        hier = stepper.solver._refresh_impl(st["solver"], vals)
        _dx, _r, kk = bsr_solve_loop(
            hier, g.reshape(nv, 3), jnp.zeros((nv, 3), dtype=stepper.dtype),
            jnp.asarray(2e-1, stepper.dtype), 20, stepper.solver.cfg)
        out["solve_cycles_power"] = int(kk)
        out["refresh_power_ms"] = round(
            slope_time(jax.jit(refresh_chain), (st["solver"], vals), 2, 8)
            * 1e3, 2)
    finally:
        bsrmod.BsrRefreshableSolver._lam = orig
    print(f"solve power-lam: {out['solve_power_ms']} ms, cycles "
          f"{out['solve_cycles_power']}; refresh {out['refresh_power_ms']}",
          flush=True)

    # 5. full step (single dispatch; seconds-scale so eager timing ok)
    def step_once():
        t0 = time.time()
        float(jnp.sum(stepper._step(st, xv, qd0, fExt)[0]))
        return time.time() - t0

    step_once()  # compile
    out["full_step_ms"] = round(min(step_once() for _ in range(3)) * 1e3, 1)
    print(f"full step: {out['full_step_ms']} ms", flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
