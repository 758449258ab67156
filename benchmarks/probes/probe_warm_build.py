"""Warm-start build measurement (VERDICT r4 item 6): ogre MCF stepper
build + first step, with the JAX persistent compilation cache enabled.
Run TWICE in separate processes: the first populates the cache, the
second measures the warm path.  Usage: probe_warm_build.py [cache_dir]
"""
import sys, time, json
sys.path.insert(0, ".")
import numpy as np


def main(cache_dir="/root/repo/.jax_cache"):
    import jax
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp
    from surface_multigrid_code_tpu.models.mcf import MCFStepper
    from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute
    from surface_multigrid_code_tpu.utils.obj_io import read_obj
    from surface_multigrid_code_tpu.utils.paths import mesh_path
    from surface_multigrid_code_tpu.utils.mesh import normalize_unit_area

    print("device:", jax.devices()[0], flush=True)
    V, F = read_obj(mesh_path("ogre"))
    V = normalize_unit_area(V, F)
    t0 = time.time(); mg = mg_precompute(V, F, verbose=False)
    t_mg = time.time() - t0
    t0 = time.time()
    stepper = MCFStepper(V, F, mg, dtype=jnp.float32, well=True)
    t_build = time.time() - t0
    t0 = time.time()
    U, r, ok = stepper.step(V.copy())
    t_first = time.time() - t0
    t0 = time.time()
    U, r, ok = stepper.step(U)
    t_second = time.time() - t0
    out = {"t_mg_s": round(t_mg, 1), "t_build_s": round(t_build, 1),
           "t_first_step_s": round(t_first, 1),
           "t_second_step_s": round(t_second, 2),
           "cycles": len(r), "ok": bool(ok)}
    print("RESULT", json.dumps(out), flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
