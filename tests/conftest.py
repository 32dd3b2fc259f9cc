"""Test configuration: run on CPU with 8 virtual devices.

Mirrors the driver's multi-chip dry-run environment so sharding tests work
without TPU hardware. The axon sitecustomize force-registers the TPU
backend, so env vars alone don't stick — we must update jax.config after
import (XLA_FLAGS still has to be in the env before the CPU backend
initializes, which is lazy).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
