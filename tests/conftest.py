"""Test harness setup: run everything on CPU with 8 fake devices so the
distributed paths are exercised without TPU hardware (SURVEY.md §4.3).

Must set the env vars before jax is imported anywhere.
"""

import os

# Force CPU even when the session env points at a TPU (JAX_PLATFORMS=axon):
# unit/parity/distributed tests are CPU-by-design; bench.py uses the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin overrides JAX_PLATFORMS during registration; the config
# update below wins over it.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
