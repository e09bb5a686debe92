"""Test configuration: run the suite on the CPU backend in float64 with 8
virtual devices, so numeric parity with the reference (double precision) and
multi-chip sharding are both testable without TPU hardware (SURVEY.md
section 4.3).

The ambient environment pins JAX_PLATFORMS to the TPU tunnel and a
sitecustomize imports jax at interpreter start, so the env var is already
consumed; jax.config.update is the reliable way to force CPU here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
