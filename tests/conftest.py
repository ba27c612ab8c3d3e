"""Test environment: force CPU with 8 virtual devices so multi-chip sharding
tests run on a single host (SURVEY §4: mesh-over-local-devices test strategy).

Must run before the first `import jax` anywhere in the test session.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# NOTE: the JAX_PLATFORMS env var is overridden by the axon TPU plugin in this
# image; jax.config.update is authoritative. GS_TPU_TESTS=1 opts out of the
# CPU force so the hardware-gated modules (tests/test_tpu_hardware.py) can see
# the real chip:  GS_TPU_TESTS=1 python -m pytest tests/test_tpu_hardware.py
if os.environ.get("GS_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
