"""Example 05 — mean-curvature flow [Kazhdan et al. 2012]
(reference 05_example_mean_curvature_flow/main.cpp).

Per step: (M - delta*L) U = M @ U_pre with delta = 0.01, where L is the
cotan Laplacian of the ORIGINAL mesh (fixed across steps, reference :42)
and M is the barycentric mass matrix of the CURRENT mesh; unconstrained
multigrid precompute every step with the hierarchy reused, mg tol 5e-7;
re-normalize surface area after each step (reference :53-80).

The reference mesh beard_man.obj is not shipped; we run on bunny.obj.
"""

from common import out_path, write_obj
from surface_multigrid_code_tpu import mg_precompute
from surface_multigrid_code_tpu.utils.mesh import normalize_unit_area
from surface_multigrid_code_tpu.utils.obj_io import read_obj
from surface_multigrid_code_tpu.utils.paths import mesh_path


def main(n_steps: int = 5):
    V, F = read_obj(mesh_path("bunny"))
    V = normalize_unit_area(V, F)
    print(f"original mesh: |V| {V.shape[0]}, |F|: {F.shape[0]}")

    mg = mg_precompute(V, F, ratio=0.25, min_coarsest_nv=500, dec_type=1)

    # Whole step (mass assembly -> Galerkin value refresh -> V-cycles ->
    # area renormalization) is one jitted device program (models/mcf.py) —
    # the reference re-runs the full multigrid precompute per step.
    import jax
    import jax.numpy as jnp

    from surface_multigrid_code_tpu.models.mcf import MCFStepper

    f64 = jax.devices()[0].platform == "cpu"
    stepper = MCFStepper(
        V, F, mg, delta=0.01, mg_tol=5e-7,
        dtype=jnp.float64 if f64 else jnp.float32,
    )

    U = V.copy()
    for step in range(n_steps):
        U, r_his, ok = stepper.step(U)
        print(
            f"step {step}: {len(r_his)} cycles, final residual {r_his[-1]:.3e}, "
            f"converged={ok}"
        )
        write_obj(out_path(f"ex05_step{step + 1}.obj"), U, F)


if __name__ == "__main__":
    main()
