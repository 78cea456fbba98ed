import os

# Deterministic CPU test environment with a virtual 8-device mesh so the
# multi-chip sharding paths compile and run without TPU hardware.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)
