"""Test harness configuration.

Forces JAX onto the CPU backend with 8 virtual devices so multi-chip
sharding logic is exercised without TPU hardware — the fake-backend
testing capability the reference lacks (SURVEY.md §4).

Note: this environment registers a TPU platform plugin from
sitecustomize that overrides the JAX_PLATFORMS env var, so the platform
must be forced via jax.config *after* import (before first backend use).
XLA_FLAGS is still read at backend-init time, so setting it here (before
any jax.devices() call) is early enough.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
