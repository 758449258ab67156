"""Test configuration: run JAX on CPU with 8 virtual devices and f64.

The container preloads a TPU PJRT plugin via sitecustomize (jax is already
imported when pytest starts), so plain env vars are too late — we force the
platform through jax.config. Multi-device sharding tests fake a pod slice
via --xla_force_host_platform_device_count (SURVEY.md §4d); numerical
oracles use float64, which the CPU backend supports natively (TPU f64 is
double-word emulation with ~2^-49 relative precision).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    # 8 virtual devices share 4 host cores; interpret-mode Pallas inside
    # shard_map makes shards slow enough to trip XLA's CPU collective
    # stuck-thread abort at its default ~30s deadline.  These raise the
    # rendezvous deadlines so slow-but-live shards aren't SIGABRTed.
    + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
    + " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, jax.devices()
