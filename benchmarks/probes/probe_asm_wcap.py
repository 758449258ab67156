"""Sweep the BSR assembly gather width W_cap: the [nnz, W, 3, 3] ELL
gather pads every vertex-pair row to the diagonal width; off-diagonal
rows have exactly 2 contributions, so narrow W + segment_sum tail should
dominate.  Reports block_vals slope per W and checks bitwise parity.
"""
import sys, time, json
sys.path.insert(0, ".")
import numpy as np


def slope_time(f, args, k_lo=2, k_hi=8, reps=3):
    ts = {}
    for k in (k_lo, k_hi):
        float(f(*args, k))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args, k))
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    return (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo)


def main(*caps):
    import jax, jax.numpy as jnp
    from surface_multigrid_code_tpu.models.balloon import (
        BsrBalloonStepper, lumped_mass_matrix)
    from surface_multigrid_code_tpu.models.shell import (
        ShellEnergy, lame_parameters)
    from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute
    from surface_multigrid_code_tpu.utils.obj_io import read_obj
    from surface_multigrid_code_tpu.utils.paths import mesh_path

    caps = [int(c) for c in caps] or [2, 4, 16]
    print("device:", jax.devices()[0], "caps:", caps, flush=True)
    V, F = read_obj(mesh_path("bunny_15K_init"))
    al, be = lame_parameters(6e6, 0.5 - 1e-3)
    shell = ShellEnergy(V, F, 1e-1, al, be, "neohookean")
    M = 1000.0 * lumped_mass_matrix(V, F)
    mg = mg_precompute(V, F, verbose=False)
    out, ref = {}, None
    for cap in caps:
        stepper = BsrBalloonStepper(shell, M, mg, 1e-3, mg_tolerance=2e-1,
                                    asm_w_cap=cap)
        st = stepper._state
        Vp = V if stepper._vperm is None else V[stepper._vperm]
        x_flat = jnp.asarray(Vp, dtype=stepper.dtype).reshape(-1)

        def full(s, x0, K, stepper=stepper):
            def body(i, x):
                v = stepper._block_vals(s, x)
                return x + 1e-30 * v[:, 0, 0].sum()
            return jnp.sum(jax.lax.fori_loop(0, K, body, x0))

        out[f"W{cap}_ms"] = round(
            slope_time(jax.jit(full), (st, x_flat), 2, 8) * 1e3, 2)
        v = np.asarray(stepper._block_vals(st, x_flat))
        if ref is None:
            ref = v
        else:
            out[f"W{cap}_max_diff"] = float(np.abs(v - ref).max())
        print(out, flush=True)
    print("RESULT", json.dumps(out), flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
