import os

# Deterministic CPU test environment with a virtual 8-device mesh so the
# multi-chip sharding paths compile and run without TPU hardware.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

# the axon TPU plugin ignores the env var; force the CPU backend so tests
# never contend for the tunneled chip
jax.config.update("jax_platforms", "cpu")
