"""JAX persistent compilation cache enablement (VERDICT r4 item 6).

Call `enable_persistent_cache()` before building solvers to persist XLA
executables across processes.  Measured effect on this TPU (v5e via the
axon tunnel, benchmarks/WARM_BUILD_r5.json): the ogre MCF stepper build
drops 88.8 -> 39.2 s warm, and the big jitted step program is a
confirmed cache HIT on the second process — but its first call still
costs ~55 s there, because the axon terminal re-lowers/loads the
custom-call executable per process regardless of the cache.  The
remaining warm cost is tunnel uploads (~0.4-0.5 s per device_put) and
that per-process load: environmental, not XLA compilation.

For the host-side staging artifacts, see solver/serialize.py
(save/load_device_hierarchy) and solver/hierarchy.save_hierarchy —
together they make every deterministic build product reusable."""

from __future__ import annotations

import os


def enable_persistent_cache(
    cache_dir: str | None = None,
    min_compile_secs: float = 0.5,
) -> str:
    """Enable jax's persistent compilation cache; returns the dir used.
    Defaults to $SMC_TPU_CACHE or ~/.cache/surface_multigrid_code_tpu."""
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "SMC_TPU_CACHE",
            os.path.expanduser("~/.cache/surface_multigrid_code_tpu"),
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_secs
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
