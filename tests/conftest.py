"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (SURVEY §4c): multi-chip sharding
is validated without TPU hardware, and CPU execution keeps the differential
tests (JAX vs pyref) hermetic.  Must be set before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
