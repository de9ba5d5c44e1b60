"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (SURVEY §4c): multi-chip sharding
is validated without TPU hardware, and CPU execution keeps the differential
tests (JAX vs pyref) hermetic.

NOTE (this container): a sitecustomize force-registers the axon TPU plugin
and overrides the JAX_PLATFORMS env var, so we must switch platforms via
jax.config *after* import — and XLA_FLAGS before the backend initialises.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the pairing graph takes minutes to compile on
# the CPU backend; cache hits make test re-runs cheap.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
